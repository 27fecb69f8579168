"""Adaptive Hilbert range partitioning (the north rule's "partitions
by cell-id range" made explicit and auditable): choose balanced range
bounds over the UNSIGNED cell-id order from a DETERMINISTIC sample,
then assign every row its range-partition id in codegen.

This is Spark's RangePartitioner design (sample -> bounds -> binary
range assignment) with two changes that make it contract-checkable:
the sample is an md5-prefix Bernoulli (identical row set on any run,
any engine, any partitioning — no RNG state), and the bound rule is
the lower ("disc") sample quantile, so the whole pipeline replays
bit-for-bit in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import cell_token, unsigned_sort_key


def _sample_prefix(rate_ppm: int) -> str:
    """Rows with md5(id) below this 32-char hex threshold are sampled:
    string < on fixed-width lowercase hex == numeric < at 8-hex-digit
    granularity.  rate_ppm >= 1_000_000 means full rate: return a
    sentinel that sorts after every lowercase-hex digest (a 9-digit
    hex threshold would string-compare wrongly against 32-char md5s
    and silently sample ~6%)."""
    if rate_ppm >= 1_000_000:
        return "g" * 32
    return f"{(rate_ppm * (1 << 32)) // 1_000_000:08x}" + "0" * 24


def hilbert_range_partitions(cells: DataFrame, n_partitions: int = 16,
                             rate_ppm: int = 20_000,
                             cell_col: str = "cell_id",
                             max_sample: int = 100_000) -> DataFrame:
    """Assign each row a balanced Hilbert-range partition id.

    1. deterministic sample: md5(cell_id as string) under the rate
       threshold (pure codegen filter, pushes to the scan);
    2. bounds = lower sample quantiles at i/n_partitions in the
       unsigned cell-id order — the sample is rate_ppm of the input,
       deterministically re-tightened to at most ~max_sample rows
       when the input is large, then collected once (documented
       bounded small-side collect, the same thing Spark's
       RangePartitioner does internally);
    3. partition_id = #bounds <= key: an unrolled sum of codegen
       comparisons — no shuffle at all for the assignment itself.

    Skewed inputs get balanced ranges automatically (that is the
    point: uniform BIT-range splits of the id space are badly
    unbalanced when the data clusters — the sample sees the real
    distribution).

    Output: input columns + partition_id:int.
    """
    key = unsigned_sort_key(F.col(cell_col))
    digest = F.md5(F.col(cell_col).cast("string"))
    pred = digest < _sample_prefix(rate_ppm)
    # Driver-safety cap: a fixed rate collects rate_ppm of the INPUT,
    # which is unbounded at scale (2% of 100 TB would OOM the driver).
    # Count the sample first (pushed-down filter + count, cheap); if it
    # exceeds max_sample, tighten the md5 threshold proportionally.
    # md5-prefix samples are NESTED (stricter prefix => subset), so the
    # capped sample is still a deterministic function of the dataset —
    # identical on any run/engine/partitioning — just at an effective
    # rate the driver can always hold.
    m_full = cells.filter(pred).count()
    if m_full > max_sample:
        eff_ppm = max(1, (rate_ppm * max_sample) // m_full)
        pred = digest < _sample_prefix(eff_ppm)
    sample = sorted(
        r[0]
        for r in cells.filter(pred).select(key.alias("k")).collect()
    )
    m = len(sample)
    bounds = []
    if m:
        for i in range(1, n_partitions):
            # lower quantile: ceil(i*m/B)-th smallest (1-based)
            rank = -(-i * m // n_partitions)
            bounds.append(sample[max(rank - 1, 0)])
    pid = F.lit(0)
    for b in bounds:
        pid = pid + (key >= F.lit(b)).cast("int")
    return cells.withColumn("partition_id", pid.cast("int"))


def hilbert_partition_stats(cells: DataFrame, n_partitions: int = 16,
                            rate_ppm: int = 20_000,
                            cell_col: str = "cell_id") -> DataFrame:
    """Balance report per range partition: row count + Hilbert-token
    span — the audit a 100-TB job logs before a range-partitioned
    write.  Output: (partition_id, n_points, min_token, max_token)."""
    d = hilbert_range_partitions(cells, n_partitions, rate_ppm, cell_col)
    ukey = unsigned_sort_key(F.col(cell_col))
    agg = d.groupBy("partition_id").agg(
        F.count("*").alias("n_points"),
        F.min(F.struct(ukey.alias("k"), F.col(cell_col).alias("c")))
        .alias("_mn"),
        F.max(F.struct(ukey.alias("k"), F.col(cell_col).alias("c")))
        .alias("_mx"),
    )
    return agg.select(
        "partition_id",
        "n_points",
        cell_token(F.col("_mn.c")).alias("min_token"),
        cell_token(F.col("_mx.c")).alias("max_token"),
    )
