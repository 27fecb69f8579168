"""Hilbert-layout sinks: write cell-keyed tables range-partitioned and
sorted by the unsigned cell key.

This is the storage half of the engine's scale story: a table written
this way gives (a) parquet/Iceberg min-max file skipping for any
cell-id range predicate (seek, range joins, tile scans), and (b)
co-partitioned reads for merge joins between tables written with the
same layout.  The BTreeMap of the reference's in-memory index
(mutable_shape_index.rs:71) becomes this on-disk layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import cell_range_max, cell_range_min, unsigned_sort_key


def write_hilbert_sorted(df: DataFrame, path: str, cell_col: str = "cell_id",
                         num_partitions: int | None = None,
                         mode: str = "overwrite") -> None:
    """Range-partition on the unsigned cell key, sort within partitions,
    write parquet.  (Iceberg: the same frame with
    ``writeTo(t).partitionedBy(bucket/sort)`` — one-line swap.)"""
    out = df.withColumn("_ukey", unsigned_sort_key(cell_col))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    out = (
        out.repartitionByRange(n, "_ukey")
        .sortWithinPartitions("_ukey")
        .drop("_ukey")
    )
    out.write.mode(mode).parquet(path)


def read_cell_range(spark: SparkSession, path: str, range_min_id: int,
                    range_max_id: int, cell_col: str = "cell_id") -> DataFrame:
    """Scan only the cells within [range_min_id, range_max_id] (u64
    semantics).  On a Hilbert-sorted table the predicate prunes files
    via parquet min/max statistics before any row is read."""
    from pyspark.sql import functions as F

    def _signed(v: int) -> int:
        u = v & 0xFFFFFFFFFFFFFFFF
        return u - (1 << 64) if u >= (1 << 63) else u

    a_u = range_min_id & 0xFFFFFFFFFFFFFFFF
    b_u = range_max_id & 0xFFFFFFFFFFFFFFFF
    a_s, b_s = _signed(a_u), _signed(b_u)
    df = spark.read.parquet(path)
    c = F.col(cell_col)
    # Predicates directly on the column so parquet min/max stats prune
    # files (an expression like (id ^ 2^63) >= k would not push down).
    if (a_u < (1 << 63)) == (b_u < (1 << 63)):
        cond = c.between(a_s, b_s)  # same sign region: one interval
    else:
        # unsigned interval crosses the sign boundary: positive tail
        # [a_s, 2^63) union negative head [-2^63, b_s]
        cond = (c >= a_s) | (c <= b_s)
    return df.filter(cond)


def write_tile_bucketed(df: DataFrame, table: str, n_buckets: int = 16,
                        key_col: str = "tile", sort: bool = True,
                        mode: str = "overwrite") -> None:
    """Hash-bucketed layout (``bucketBy`` + ``sortBy`` + catalog table):
    the co-located-join half of the storage story, complementing
    ``write_hilbert_sorted``'s range layout.

    Two tables written with the SAME (n_buckets, key_col) join on
    key_col with ZERO runtime exchange — Spark's scan exposes the
    bucket spec as the output partitioning, so SortMergeJoin's
    children need no shuffle (and with ``sort=True`` no re-sort): at
    100 TB this turns every repeated tile-keyed join (raster x vector,
    doc x embedding, per-tile rollup reuse) from an all-to-all network
    pass into a per-bucket streamed merge.  The equivalent Iceberg
    layout is ``partitionedBy(bucket(n, key))`` — one-line swap, same
    plan shape.  tests/test_bucketed_layout.py asserts the plan is
    exchange-free and the join result matches the shuffled twin.
    """
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key_col)
    if sort:
        w = w.sortBy(key_col)
    w.saveAsTable(table)


def co_located_join(spark: SparkSession, table_a: str, table_b: str,
                    key_col: str = "tile", how: str = "inner") -> DataFrame:
    """Join two ``write_tile_bucketed`` tables on their bucket key.

    Pure convenience over spark.table(...).join(...): the zero-shuffle
    property lives in the table layout, not in this function — any
    equi-join on the bucket key of two same-spec tables gets it."""
    return spark.table(table_a).join(spark.table(table_b), key_col, how)
