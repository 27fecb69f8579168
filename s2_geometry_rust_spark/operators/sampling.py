"""Deterministic sampling for training-corpus curation.

Engine additions (no s2-geometry-rust counterpart): reproducible
hash-ordered samples — the same rows come back on every run, on every
cluster size, with no RNG state — which is what a 100-TB curation
pipeline needs for auditability (a `rand()`-based sample is neither
re-runnable nor oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def stratified_sample(df: DataFrame, strata: list[str], quota: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Top-``quota`` rows per stratum in md5(id) order — a deterministic
    uniform sample within each stratum (md5 scrambles the id space).

    Scale shape: one shuffle on the strata key + a per-partition top-k
    window.  For small quotas Spark's WindowGroupLimit pushes the
    rank<=k limit into the sort (partial top-k before the exchange at
    the map side under AQE), so a hot stratum never materializes more
    than its partition-local top-k per map task.

    Output: input columns + ``sample_rank`` (1..quota per stratum).
    """
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(*strata).orderBy(key, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= quota)
    )


def bernoulli_sample(df: DataFrame, rate_ppm: int,
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex
    digits of md5(id), read as a 32-bit integer, fall under
    rate_ppm/1e6 of the 2^32 space.  Pure codegen filter — pushes all
    the way down to the scan, no shuffle, and the kept set is
    independent of partitioning.
    """
    bucket = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    threshold = (rate_ppm * (1 << 32)) // 1_000_000
    return df.filter(bucket < F.lit(threshold))


def weighted_sample_per_group(df: DataFrame, k: int = 20,
                              group_col: str = "source",
                              weight_col: str = "n_chars",
                              id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirakis
    A-ES): within each group, keep the ``k`` rows with the largest
    ln(u)/w, where u is a hash-derived uniform in (0,1) and w the row
    weight — equivalent to sampling without replacement with
    probability proportional to weight, but replayable bit-for-bit
    (the u values are md5-of-id, so the draw is the same on every run
    and every cluster size, and the DuckDB oracle reproduces it).

    Scale shape: identical to stratified_sample — one shuffle on the
    group key with Spark's WindowGroupLimit pushing the rank<=k cut
    below the exchange (partial per-partition top-k map-side), so a
    hot group never materializes beyond its local top-k per task.

    Ranking note: ln() is the one non-IEEE-pinned op (libm may differ
    in the last ulp across engines); keys are ratios of
    hash-uniform randoms, so adjacent-key gaps are macroscopic
    (~1e-3) and a last-ulp drift cannot flip the selection — asserted
    against the fixture corpus in tests/test_pipeline_round3b.py.

    Output: input columns + ``sample_rank`` (1..k per group).
    """
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    u = (h.cast("double") + 0.5) / float(1 << 60)
    key = F.log(u) / F.col(weight_col).cast("double")
    w = Window.partitionBy(group_col).orderBy(
        F.desc("_wrs_key"), F.col(id_col)
    )
    return (
        df.withColumn("_wrs_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .drop("_wrs_key")
    )


def corpus_mix(df: DataFrame, mix: dict[str, float], budget: int,
               group_col: str = "source",
               id_col: str = "doc_id") -> DataFrame:
    """Data-mixture targeting for training corpora: draw a ``budget``-
    doc sample whose composition follows the target ``mix`` (source ->
    weight, normalized over the sources present), deterministically.

    Per-source quota = round(budget * weight / total_weight)
    (half-away, exactly mirrored in SQL), capped by availability; rows
    are taken in md5(id) order — the stratified_sample quota machinery
    with quotas computed FROM the mix instead of a constant, so the
    same WindowGroupLimit partial-top-k shape applies and a hot source
    never materializes beyond its quota per map task.

    Output: input columns + sample_rank + quota.
    """
    total = sum(mix.values())
    quotas = [
        (s, int((budget * w) / total + 0.5)) for s, w in mix.items()
    ]
    spark = df.sparkSession
    qdf = spark.createDataFrame(quotas, f"{group_col} string, quota long")
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(key, F.col(id_col))
    return (
        df.join(F.broadcast(qdf), group_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.col("quota"))
    )
