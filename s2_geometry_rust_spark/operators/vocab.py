"""Corpus-level vocabulary / n-gram statistics (engine additions for
the training-data pipeline; no s2-geometry-rust counterpart).

Scale shapes:
- token/ngram counts: explode -> groupBy(token) is ONE shuffle with
  map-side combine (partial counts per task before the exchange), the
  canonical word-count plan; the top-k cut happens with a window over
  the already-aggregated (small) count table.
- label centroids: per-partition numpy partial sums via mapInPandas
  (nothing leaves a task but one row per (label, partition)), then one
  tiny groupBy — the treeAggregate shape for wide-vector reductions.
  Elements are quantized to a 1e-6 integer grid FIRST, so the sums are
  exact integers: order-independent, bit-reproducible on any cluster
  and against the SQL oracle (float sums are neither).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )


def vocab_topk(docs: DataFrame, k: int = 100,
               text_col: str = "text") -> DataFrame:
    """Top-k corpus vocabulary by frequency: (token, n_occurrences,
    n_docs, rank), ties broken lexicographically for determinism."""
    tok = docs.select(
        F.col("doc_id"), F.explode(_tokens(text_col)).alias("token")
    )
    counts = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.count_distinct("doc_id").alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), "token")
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _ngrams_of(toks: F.Column, n: int) -> F.Column:
    """Space-joined token n-grams of a MATERIALIZED token-array column.

    ``toks`` must be a plain column reference (not the tokenization
    expression tree): higher-order functions are interpreted with no
    subexpression elimination, so referencing the split/lower chain
    inside the lambda would re-tokenize the document once per element.
    """
    return F.filter(
        F.transform(
            toks,
            lambda _, i: F.when(
                i + n <= F.size(toks),
                F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ),
        lambda g: g.isNotNull(),
    )


def ngram_counts(docs: DataFrame, n: int = 2, min_count: int = 2,
                 text_col: str = "text") -> DataFrame:
    """Corpus n-gram counts (space-joined token n-grams) with a minimum
    frequency cut — the LM-style count table.  The n-gram expansion is
    a per-row array transform (zero shuffle); only the groupBy
    aggregates."""
    g = (
        docs.withColumn("_toks", _tokens(text_col))
        .select(F.explode(_ngrams_of(F.col("_toks"), n)).alias("ngram"))
    )
    return (
        g.groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
    )


_CENTROID_PARTIAL_SCHEMA = StructType(
    [
        StructField("label", IntegerType()),
        StructField("n", LongType()),
        StructField("sums_micro", ArrayType(LongType())),
    ]
)


def label_centroid_sums(embs: DataFrame, label_col: str = "label",
                        vec_col: str = "embedding") -> DataFrame:
    """Exact per-label embedding sums: (label, n_vectors, dim,
    sum_micro) — one output row per (label, dimension), where sum_micro
    is the integer sum of round(element * 1e6).

    Partial aggregation happens inside each task (numpy add.reduceat
    over the Arrow batch grouped by label); the exchange carries one
    row per (label, partition), NOT per vector — a 10^12-row table with
    100 labels shuffles ~100 rows per task.
    """

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[int, tuple[int, np.ndarray]] = {}
        for b in batches:
            if len(b) == 0:
                continue
            labels = b[label_col].to_numpy(np.int64)
            # widen float32 -> float64 BEFORE scaling (exact), so the
            # quantization matches the SQL oracle's double arithmetic.
            # Round half-AWAY-from-zero (trunc(x + copysign(.5, x))) to
            # match DuckDB/Spark round(): exact halves DO occur — a
            # float32 that is an odd multiple of 2^-7 scales to k+1/2
            # (0.0078125 * 1e6 = 7812.5), where np.rint (half-even)
            # would diverge.
            scaled = np.stack(b[vec_col].to_numpy()).astype(np.float64) * 1e6
            mat = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
            order = np.argsort(labels, kind="stable")
            labels_s = labels[order]
            mat_s = mat[order]
            uniq, starts = np.unique(labels_s, return_index=True)
            sums = np.add.reduceat(mat_s, starts, axis=0)
            counts = np.diff(np.append(starts, len(labels_s)))
            for lb, cnt, sm in zip(uniq, counts, sums):
                prev = acc.get(int(lb))
                if prev is None:
                    acc[int(lb)] = (int(cnt), sm.copy())
                else:
                    acc[int(lb)] = (prev[0] + int(cnt), prev[1] + sm)
        if acc:
            yield pd.DataFrame(
                {
                    "label": list(acc),
                    "n": [v[0] for v in acc.values()],
                    "sums_micro": [v[1] for v in acc.values()],
                }
            )

    part = embs.select(label_col, vec_col).mapInPandas(
        partials, _CENTROID_PARTIAL_SCHEMA
    )
    exploded = part.select(
        "label", "n", F.posexplode("sums_micro").alias("dim", "s")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.sum("n").alias("n_vectors"),
            F.sum("s").alias("sum_micro"),
        )
    )


def ngram_set(docs: DataFrame, n: int, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Distinct (id, ngram) pairs per document — the unit of overlap
    for decontamination."""
    return docs.withColumn("_toks", _tokens(text_col)).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(_ngrams_of(F.col("_toks"), n))
        ).alias("ngram"),
    )


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 5,
                  text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: per corpus document, how many distinct
    n-grams it shares with ANY benchmark document (0 = clean).  The
    standard pre-training hygiene step (flag-and-drop docs overlapping
    an eval set).

    Scale shape: the benchmark side is tiny by definition (eval sets),
    so its distinct n-gram set is broadcast; the corpus side streams
    through a per-row array expansion + broadcast hash semi-join —
    the 100-TB side is never shuffled.  Output: (doc_id,
    n_contaminated_ngrams) for flagged docs only.
    """
    bench_grams = F.broadcast(
        ngram_set(benchmark, n, text_col=text_col)
        .select("ngram").distinct()
    )
    doc_grams = ngram_set(docs, n, text_col=text_col)
    return (
        doc_grams.join(bench_grams, "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_ngrams"))
    )


def vocab_topk_per_group(docs: DataFrame, k: int = 5,
                         group_col: str = "lang",
                         text_col: str = "text") -> DataFrame:
    """Top-k vocabulary PER GROUP: (group, token, n_occurrences, rank).

    Unlike the global vocab_topk (TakeOrderedAndProject collapses the
    whole ranking into one partial top-k), the per-group ranking rides
    a (group)-partitioned window over the (group, token) counts —
    WindowGroupLimit pushes the rank<=k cut below the final sort, so a
    large group never materializes more than its partition-local top-k
    per map task.  Ties break lexicographically for determinism.
    """
    tok = docs.select(
        F.col(group_col), F.explode(_tokens(text_col)).alias("token")
    )
    counts = tok.groupBy(group_col, "token").agg(
        F.count("*").alias("n_occurrences")
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("n_occurrences"), "token"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def label_similarity(embs: DataFrame, label_col: str = "label",
                     vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine similarity between per-label centroids —
    the inter-class structure report over a labeled embedding table.

    Rides label_centroid_sums' exact-integer grid: cosine is
    scale-invariant, so the centroids' cosines equal the cosines of
    the integer SUM vectors — dot products and squared norms are exact
    int64 sums (no float accumulation), and the only float ops are the
    final sqrt/divide, identical in any IEEE engine.  The pair join
    runs over (labels x dims) rows — label-cardinality-sized, never
    the input.

    Output: (label_a, label_b, dot, cos_nano) with label_a < label_b.
    """
    # sum_micro entries scale with group size (~n * 1e6 at unit-norm
    # elements), so sum(sa*sb) over dims can exceed 2^63 for labels
    # beyond a few thousand rows — long accumulation would crash the
    # job under ANSI mode (Spark 4 default) or wrap silently without
    # it.  Accumulate products as decimal(38,0): exact integers up to
    # 1e38, room for ~1e10-row labels.  The emitted `dot` stays BIGINT
    # for the contract; past int64 it becomes NULL (loud) instead of
    # an error/garbage, while cos_nano — computed from the decimals —
    # stays correct.
    sums = label_centroid_sums(embs, label_col, vec_col)
    s_dec = F.col("sum_micro").cast("decimal(19,0)")
    norms = sums.groupBy(label_col).agg(
        F.sum(s_dec * F.col("sum_micro")).alias("_n2")
    )
    a = sums.select(
        F.col(label_col).alias("label_a"), "dim",
        s_dec.alias("_sa"),
    )
    b = sums.select(
        F.col(label_col).alias("label_b"), "dim",
        F.col("sum_micro").alias("_sb"),
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("_sa") * F.col("_sb")).alias("_dot"))
    )
    na = norms.select(F.col(label_col).alias("label_a"),
                      F.col("_n2").alias("_n2a"))
    nb = norms.select(F.col(label_col).alias("label_b"),
                      F.col("_n2").alias("_n2b"))
    d = dots.join(na, "label_a").join(nb, "label_b")
    cos = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_n2a").cast("double"))
        * F.sqrt(F.col("_n2b").cast("double"))
    )
    return d.select(
        "label_a", "label_b",
        F.col("_dot").try_cast("long").alias("dot"),
        F.round(cos * 1e9, 0).cast("long").alias("cos_nano"),
    )


def _bloom_positions(ngram_col: F.Column, m_bits: int,
                     k_hashes: int) -> F.Column:
    """The k Bloom bit positions of one n-gram: position_i =
    int(md5(ngram || '#' || i)[:15 hex]) % m_bits.  md5 renders as the
    same lowercase hex in Spark and DuckDB and 15 hex digits = 60 bits
    fit a signed int64, so positions are engine-independent (the
    wrs_sample / bpe hash convention)."""
    return F.array(*[
        F.conv(
            F.substring(
                F.md5(F.concat(ngram_col, F.lit(f"#{i}"))), 1, 15
            ), 16, 10
        ).cast("long") % m_bits
        for i in range(k_hashes)
    ])


def bloom_decontaminate(docs: DataFrame, benchmark: DataFrame,
                        n: int = 3, m_bits: int = 4096,
                        k_hashes: int = 4,
                        text_col: str = "text") -> DataFrame:
    """Bloom-filter decontamination — the no-string-broadcast scale
    path of `decontaminate`.  The benchmark's n-grams are reduced to a
    Bloom bit SET (k md5-derived positions per gram, m_bits space);
    a corpus n-gram is flagged when ALL k of its positions are set.
    Output: (doc_id, n_flagged_ngrams) for docs with >= 1 flagged
    distinct gram — `decontaminate`'s schema, with the Bloom filter's
    deterministic false positives included (they are the documented
    price of the fixed-size filter, and both engines replay them
    identically: oracle.bloom_decontaminate_sql re-derives every
    position from the same md5 strings).

    Why it scales where the exact join cannot: `decontaminate`
    broadcasts the benchmark's distinct n-gram STRINGS — fine for eval
    sets, unbounded for e.g. "decontaminate against this other 1-TB
    corpus".  Here the broadcast side is at most min(k*|grams|, m_bits)
    int64s regardless of benchmark size (m_bits = 2^27 is 16 MB as a
    bitset; this join form ships the set positions, the mapInPandas
    bitset variant would ship the bits).  The corpus side is one scan:
    grams -> posexplode(k positions) -> broadcast hash join -> count
    matched positions == k.  The only shuffle is the final per-doc
    count of flagged grams.
    """
    bench_pos = F.broadcast(
        ngram_set(benchmark, n, text_col=text_col)
        .select(F.explode(
            _bloom_positions(F.col("ngram"), m_bits, k_hashes)
        ).alias("pos"))
        .distinct()
    )
    doc_pos = (
        ngram_set(docs, n, text_col=text_col)
        .select(
            "doc_id", "ngram",
            F.posexplode(
                _bloom_positions(F.col("ngram"), m_bits, k_hashes)
            ).alias("hash_i", "pos"),
        )
    )
    flagged = (
        doc_pos.join(bench_pos, "pos")
        .groupBy("doc_id", "ngram")
        .agg(F.count("*").alias("_n_set"))
        .filter(F.col("_n_set") == k_hashes)
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_flagged_ngrams")
    )


def lm_bigram_novelty(docs: DataFrame, min_df: int = 30,
                      text_col: str = "text") -> DataFrame:
    """Per-document bigram-LM novelty scoring — the count-based cousin
    of perplexity (which needs ln and so can't be bit-exact across
    engines): how much of a document is built from corpus-common
    bigrams vs bigrams the corpus has rarely seen.  Low mean_df / high
    novelty_rate flags gibberish, boilerplate mutations, and genuinely
    novel text for routing or down-weighting.

    Per doc over its bigram OCCURRENCES (multiplicity kept):

    - ``n_bigrams``: occurrence count,
    - ``n_known``: occurrences whose bigram document-frequency in the
      corpus is >= ``min_df``,
    - ``sum_df``: exact int64 sum of the occurrences' doc-frequencies,
    - ``novelty_rate`` = (n_bigrams - n_known) / n_bigrams,
    - ``mean_df`` = sum_df / n_bigrams,

    both ratios a SINGLE int64->double division (IEEE-exact, engine ==
    oracle bit-for-bit; never a sum of per-row doubles whose order
    would matter).  Docs with < 2 tokens get zero counts and NULL
    ratios.

    Scale shape: the bigram expansion is a row-local array transform
    (zero shuffle); the df table is one map-side-combinable groupBy on
    the bigram key; the occurrence<->df equi-join is keyed by bigram
    (high-cardinality, no skew hot-spotting: the hottest fixture bigram
    covers < 1e-3 of occurrences, and a df table small enough gets
    broadcast by AQE); the per-doc rollup partial-aggregates before its
    single exchange.
    """
    toks = docs.withColumn("_toks", _tokens(text_col))
    bg = toks.select(
        "doc_id", F.explode(_ngrams_of(F.col("_toks"), 2)).alias("bigram")
    )
    df_table = (
        bg.dropDuplicates(["doc_id", "bigram"])
        .groupBy("bigram")
        .agg(F.count("*").alias("df"))
    )
    per = (
        bg.join(df_table, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                F.when(F.col("df") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_known"),
            F.sum("df").alias("sum_df"),
        )
    )
    ratio = F.col("n_bigrams").cast("double")
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("n_known", F.lit(0)).cast("long").alias("n_known"),
            F.coalesce("sum_df", F.lit(0)).alias("sum_df"),
            F.when(
                F.col("n_bigrams") > 0,
                (F.col("n_bigrams") - F.col("n_known")).cast("double") / ratio,
            ).alias("novelty_rate"),
            F.when(
                F.col("n_bigrams") > 0, F.col("sum_df").cast("double") / ratio
            ).alias("mean_df"),
        )
    )


def collocations(docs: DataFrame, min_count: int = 5, k: int = 50,
                 text_col: str = "text") -> DataFrame:
    """Collocation (phrase) mining by exact-integer lift — the PMI
    stand-in that stays bit-exact across engines (PMI's log changes no
    ranking: log is monotone, so top-k by lift == top-k by PMI).

    Over the corpus bigram-occurrence stream (N = total bigram count):

        lift(a b) = (n_ab * N) / (n_left_a * n_right_b)

    where n_left_a / n_right_b count occurrences of ``a`` as a first
    token / ``b`` as a second token.  Both products are exact int64
    (bound documented below); the division is ONE double op, so ranks
    and values replay bit-for-bit in the oracle.  High lift = the pair
    sticks together far more than its parts predict — the classic
    phrase-vocabulary / tokenizer-merge signal.

    Output: top-``k`` (bigram, n_ab, n_left, n_right, lift) by
    (lift DESC, bigram ASC), rank included — deterministic ties.

    Scale shape: bigram expansion is row-local; three count tables are
    map-side-combinable groupBys; the margin joins key on single
    tokens (the hottest fixture token covers ~2% of occurrences; at
    web scale the margins table is tiny relative to the stream and
    broadcastable); final top-k is a WindowGroupLimit over the
    already-aggregated bigram table, never raw occurrences.  int64
    bound: n_ab * N < 2^63 holds while N < ~3e9 with n_ab <= N; past
    that, compute lift per SHARD (date/source) and merge, or widen to
    decimal — documented, not silent.
    """
    toks = docs.withColumn("_toks", _tokens(text_col))
    bg = toks.select(
        F.explode(_ngrams_of(F.col("_toks"), 2)).alias("bigram")
    ).select(
        "bigram",
        F.split(F.col("bigram"), " ", 2).getItem(0).alias("w1"),
        F.split(F.col("bigram"), " ", 2).getItem(1).alias("w2"),
    )
    pair = bg.groupBy("bigram", "w1", "w2").agg(F.count("*").alias("n_ab"))
    left = bg.groupBy("w1").agg(F.count("*").alias("n_left"))
    right = bg.groupBy("w2").agg(F.count("*").alias("n_right"))
    total = pair.agg(F.sum("n_ab").alias("n_total"))
    scored = (
        pair.filter(F.col("n_ab") >= min_count)
        .join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram", "n_ab", "n_left", "n_right",
            (
                (F.col("n_ab") * F.col("n_total")).cast("double")
                / (F.col("n_left") * F.col("n_right")).cast("double")
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.desc("lift"), "bigram")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
