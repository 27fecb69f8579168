"""The engine's query suite: named (spark, sf_dir) -> DataFrame
callables plus their DuckDB oracle SQL, consumed by __spark_entry__.

Geometry queries derive deterministic points from the driver tables with
exactly-rounded arithmetic (no trig) so the DuckDB oracle reproduces the
same doubles bit-for-bit; the Hilbert encoding itself is oracled by the
pure-SQL implementation in ``oracle.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import oracle
from .functions import (
    cell_face,
    cell_id_from_xyz,
    cell_parent,
    cell_token,
)


def _derived_points(spark: SparkSession, sf_dir: str,
                    table: str = "customer", key: str = "c_custkey") -> DataFrame:
    """Spark twin of oracle.derived_points_sql — same exact doubles."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    k = F.col(key)
    return df.select(
        k.alias("point_id"),
        ((k * 37 % 997) / 498.5 - 1.0).alias("x"),
        ((k * 73 % 991) / 495.5 - 1.0).alias("y"),
        ((k * 101 % 983) / 491.5 - 1.0).alias("z"),
    )


def leaf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point -> leaf cell id (cell_id.rs:175-238): the Hilbert core."""
    pts = _derived_points(spark, sf_dir)
    return pts.select(
        "point_id",
        cell_id_from_xyz("x", "y", "z").alias("cell_id"),
    ).select(
        "point_id",
        "cell_id",
        cell_face("cell_id").alias("face"),
        cell_token("cell_id").alias("token"),
    )


def tile_counts_l8(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = leaf_assign(spark, sf_dir)
    return (
        df.withColumn("tile_id", cell_parent("cell_id", 8))
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
        .select("tile_id", cell_token("tile_id").alias("tile_token"), "n_points")
    )


def tile_counts_l12(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = leaf_assign(spark, sf_dir)
    return (
        df.withColumn("tile_id", cell_parent("cell_id", 12))
        .groupBy("tile_id")
        .agg(F.count("*").alias("n_points"))
        .select("tile_id", cell_token("tile_id").alias("tile_token"), "n_points")
    )


def face_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        leaf_assign(spark, sf_dir)
        .groupBy("face")
        .agg(F.count("*").alias("n_points"))
    )


QUERIES = {
    "leaf_assign": leaf_assign,
    "tile_counts_l8": tile_counts_l8,
    "tile_counts_l12": tile_counts_l12,
    "face_counts": face_counts,
}

ORACLES = {
    "leaf_assign": oracle.leaf_assign_sql(),
    "tile_counts_l8": oracle.tile_counts_sql(8),
    "tile_counts_l12": oracle.tile_counts_sql(12),
    "face_counts": oracle.face_counts_sql(),
}
