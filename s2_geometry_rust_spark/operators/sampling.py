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
