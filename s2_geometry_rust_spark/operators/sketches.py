"""Distinct-count sketches for training-corpus statistics (engine
addition — no reference counterpart; standard pipeline telemetry):
KMV (k-minimum-values) per-group distinct estimation with a hash both
Spark and DuckDB evaluate bit-identically (md5 hex prefix), so the
sketch registers — and therefore the estimate — replay exactly in the
SQL oracle, unlike HLL++ whose register layout is engine-private.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Hash domain: first 15 hex digits of md5 -> 60-bit integer in [0, M].
KMV_M = (1 << 60) - 1


def kmv_distinct_per_group(docs: DataFrame, k: int = 64,
                           group_col: str = "lang",
                           text_col: str = "text",
                           ngram: int = 2) -> DataFrame:
    """Per-group distinct token-``ngram`` estimate via the KMV sketch:
    keep the k smallest hashes per group; estimate = (k-1) * M / h_k.
    (Bigrams by default: the n-gram vocabulary is the quantity a corpus
    dashboard actually tracks, and it is large enough to exercise the
    estimation branch where the plain word vocabulary is not.)

    Scale shape (100 TB): the naive formulation (row_number over every
    distinct hash per group) windows the full vocabulary through one
    partition per group.  Instead:

    1. distinct (group, h) — one shuffle with map-side partial
       aggregation; state per task is the distinct set, the unavoidable
       cost of EXACT distinct (kept here only so the output demonstrates
       sketch accuracy; a pure-sketch pipeline drops it and this stage
       becomes a bounded partial-agg).
    2. a 4096-bucket prefix histogram (h >> 48) per group — tiny, and
       its per-group sum is the exact distinct count for free.
    3. the k-th-smallest cutoff prefix from the histogram's running sum
       prunes the survivor set to O(k) rows per group BEFORE the
       row_number window, so the final sort touches ~k rows per group,
       not the vocabulary.

    Groups are languages (low cardinality) — the histogram and cutoff
    frames broadcast-join back onto the hashed stream.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(group_col, toks.alias("_toks"))
    if ngram > 1:
        # guard: sequence(1, 0) would DESCEND in Spark, so emit an
        # empty gram list for docs shorter than the n-gram order
        grams = F.when(
            F.size("_toks") >= ngram,
            F.transform(
                F.sequence(
                    F.lit(1), (F.size("_toks") - (ngram - 1)).cast("int")
                ),
                lambda i: F.concat_ws(" ", F.slice("_toks", i, ngram)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        grams = F.col("_toks")
    hashed = (
        base.select(group_col, F.explode(grams).alias("tok"))
        .select(
            group_col,
            F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .distinct()
    )
    pref = hashed.withColumn("pfx", F.shiftright("h", 48))
    hist = pref.groupBy(group_col, "pfx").agg(F.count("*").alias("c"))
    wcum = (
        Window.partitionBy(group_col)
        .orderBy("pfx")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cut = (
        hist.withColumn("cum", F.sum("c").over(wcum))
        .groupBy(group_col)
        .agg(
            F.min(F.when(F.col("cum") >= k, F.col("pfx"))).alias("cut_pfx"),
            F.sum("c").alias("n_exact"),
        )
    )
    surv = pref.join(F.broadcast(cut), group_col).filter(
        F.col("cut_pfx").isNull() | (F.col("pfx") <= F.col("cut_pfx"))
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kth = surv.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == F.least(F.col("n_exact"), F.lit(k).cast("long"))
    )
    # (k-1)*M exact-once in f64, then / h — identical op order to the
    # oracle SQL, so the doubles (and the half-up round) match exactly.
    est = F.round(
        F.lit(float(k - 1)) * F.lit(float(KMV_M)) / F.col("h").cast("double"),
        0,
    )
    return kth.select(
        F.col(group_col),
        F.col("n_exact").cast("long").alias("n_distinct_exact"),
        F.when(F.col("n_exact") <= k, F.col("n_exact"))
        .otherwise(est)
        .cast("long")
        .alias("kmv_estimate"),
    )


def exact_group_quantiles(df: DataFrame, group_col: str, value_col: str,
                          ps: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
                          ) -> DataFrame:
    """EXACT per-group quantiles at scale via distinct-value
    compression (lower / "disc" semantics: the smallest value whose
    cumulative count reaches ceil(p * n)).

    The classic exact-quantile trap at 100 TB is sorting every row per
    group through one window partition.  Integer-ish columns (lengths,
    token counts, scores on a grid) have FAR fewer distinct values than
    rows, so instead:

    1. groupBy (group, value) count — one shuffle, map-side partial
       aggregation collapses the data to the distinct-value histogram;
    2. running count over the histogram ordered by value — the window
       touches only distinct values (thousands, not billions);
    3. explode the requested p's and keep the first histogram row whose
       cumulative count reaches the target rank.

    Every value is an exact integer comparison — no interpolation, no
    float drift — so the result replays exactly in any engine.

    Output: (group_col, p:double, q_value, n:long).
    """
    hist = df.groupBy(group_col, value_col).agg(
        F.count("*").alias("_cnt")
    )
    w = Window.partitionBy(group_col).orderBy(value_col)
    hist = hist.withColumn("_cum", F.sum("_cnt").over(w))
    totals = df.groupBy(group_col).agg(F.count("*").alias("n"))
    pcol = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    ranks = totals.select(group_col, "n", pcol).withColumn(
        "_target", F.ceil(F.col("p") * F.col("n")).cast("long")
    )
    joined = hist.join(ranks, group_col).filter(
        F.col("_cum") >= F.col("_target")
    )
    return (
        joined.groupBy(group_col, "p", "n")
        .agg(F.min(value_col).alias("q_value"))
        .select(group_col, "p", "q_value", "n")
    )
