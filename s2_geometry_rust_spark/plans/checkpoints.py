"""Checkpoint / lineage persistence for resumable stages (north_rule).

Every stage writes per-partition metrics — (stage, partition_id,
cell-range covered, row_count, latency_ms, lineage string) — to an
append-only table; a restarted job anti-joins its work units against
completed checkpoints and re-runs only the gap.

Storage: a ``path`` of the form ``table:<warehouse>:<name>`` routes
through :mod:`..sources.iceberg` — the real Iceberg ``writeTo(...)``
catalog API when the runtime jars are on the classpath, a
byte-compatible parquet layout otherwise (this sandbox has no Iceberg
jars).  A plain filesystem path appends parquet directly.  The schema
and append/anti-join protocol are identical in all three cases, so
adopting Iceberg on a real cluster is a config/URI change only.

The per-partition metrics are gathered *inside* the data pass with
``mapInPandas`` (no separate job): each partition emits its data rows
plus updates a local accumulator row that is dumped at partition end.
For simplicity and determinism we instead compute metrics as a by-product
aggregation over the keyed output (one extra cheap agg job on columns
already in memory).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions import unsigned_sort_key
from ..sources import iceberg as _catalog


def _parse_table_uri(path: str) -> tuple[str, str] | None:
    """``table:<warehouse>:<name>`` → (warehouse, name); else None."""
    if path.startswith("table:"):
        _, warehouse, name = path.split(":", 2)
        return warehouse, name
    return None


def _append(df: DataFrame, path: str) -> None:
    uri = _parse_table_uri(path)
    if uri is not None:
        _catalog.write_table(df, uri[1], uri[0], mode="append")
    else:
        df.write.mode("append").parquet(path)


def _read(spark: SparkSession, path: str) -> DataFrame:
    uri = _parse_table_uri(path)
    if uri is not None:
        return _catalog.read_table(spark, uri[1], uri[0])
    return spark.read.parquet(path)

CHECKPOINT_SCHEMA = StructType(
    [
        StructField("stage", StringType()),
        StructField("unit_id", LongType()),       # work-unit key (e.g. tile)
        StructField("cell_range_min", LongType()),
        StructField("cell_range_max", LongType()),
        StructField("row_count", LongType()),
        StructField("latency_ms", DoubleType()),
        StructField("lineage", StringType()),
        StructField("ts", DoubleType()),
    ]
)


def write_stage_checkpoint(df: DataFrame, stage: str, unit_col: str,
                           cell_col: str, path: str, lineage: str = "") -> None:
    """Aggregate per-work-unit metrics of a finished stage and append
    them to the checkpoint table.

    Latency protocol: per-unit rows carry latency_ms = NULL (they are
    written by the same job whose duration is being measured — a
    pre-action literal would always record ~0); after the write action
    completes, one sentinel row (unit_id = -1, lineage suffixed
    ``#stage_total``) is appended with the measured wall time of the
    whole stage write."""
    spark = df.sparkSession
    metrics = (
        df.groupBy(F.col(unit_col).alias("unit_id"))
        .agg(
            F.min(unsigned_sort_key(cell_col)).alias("_rmin"),
            F.max(unsigned_sort_key(cell_col)).alias("_rmax"),
            F.count("*").alias("row_count"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("unit_id").cast("long"),
            F.col("_rmin").bitwiseXOR(F.lit(-9223372036854775808)).alias(
                "cell_range_min"
            ),
            F.col("_rmax").bitwiseXOR(F.lit(-9223372036854775808)).alias(
                "cell_range_max"
            ),
            "row_count",
            F.lit(None).cast("double").alias("latency_ms"),
            F.lit(lineage).alias("lineage"),
            F.lit(time.time()).alias("ts"),
        )
    )
    t0 = time.time()
    _append(metrics, path)
    elapsed_ms = (time.time() - t0) * 1000.0
    total = spark.createDataFrame(
        [(stage, -1, None, None, None, elapsed_ms,
          f"{lineage}#stage_total", time.time())],
        CHECKPOINT_SCHEMA,
    )
    _append(total.coalesce(1), path)


def completed_units(spark: SparkSession, stage: str, path: str) -> DataFrame:
    """Distinct work units already checkpointed for a stage."""
    try:
        cp = _read(spark, path)
    except Exception:
        return spark.createDataFrame([], "unit_id long")
    return (
        cp.filter(F.col("stage") == stage)
        .filter(~F.col("lineage").endswith("#stage_total"))
        .select("unit_id")
        .distinct()
    )


def resume_filter(work: DataFrame, spark: SparkSession, stage: str,
                  path: str, unit_col: str) -> DataFrame:
    """Drop work units that already completed — restart = run this
    filter then process what remains."""
    done = completed_units(spark, stage, path)
    return work.join(
        F.broadcast(done.withColumnRenamed("unit_id", unit_col)),
        unit_col,
        "left_anti",
    )
