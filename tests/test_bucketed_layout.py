"""Bucketed co-located layout: two tables written with the same
(n_buckets, key) spec must join with ZERO runtime exchange, and the
result must equal the ordinary shuffled join."""

import uuid

import pytest
from pyspark.sql import functions as F

from s2_geometry_rust_spark.functions import cell_parent
from s2_geometry_rust_spark.sources import extract_geo_points, synth_documents
from s2_geometry_rust_spark.sources.sinks import (
    co_located_join,
    write_tile_bucketed,
)


@pytest.fixture(scope="module")
def tile_tables(spark):
    docs = synth_documents(spark, 600, seed=7)
    pts = extract_geo_points(docs).withColumn(
        "tile", cell_parent("cell_id", 8)
    )
    a = pts.select("tile", "doc_id", "lat", "lng")
    b = (
        pts.groupBy("tile")
        .agg(F.count("*").alias("n_pts"),
             F.min("doc_id").alias("min_doc"))
    )
    tag = uuid.uuid4().hex[:8]
    ta, tb = f"bl_a_{tag}", f"bl_b_{tag}"
    write_tile_bucketed(a, ta, n_buckets=8, key_col="tile")
    write_tile_bucketed(b, tb, n_buckets=8, key_col="tile")
    yield ta, tb, a, b
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_co_located_join_is_exchange_free(spark, tile_tables):
    """With broadcast off (at scale neither side broadcasts), the join
    of two same-spec bucketed tables is a shuffle-free merge: bucket
    partitioning satisfies the join's distribution requirement."""
    ta, tb, _, _ = tile_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = co_located_join(spark, ta, tb, "tile")
        # Materialize so AQE finalizes, then inspect the executed plan.
        joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_co_located_join_matches_shuffled_twin(spark, tile_tables):
    ta, tb, a, b = tile_tables
    got = {
        tuple(r) for r in co_located_join(spark, ta, tb, "tile")
        .select("tile", "doc_id", "n_pts", "min_doc").collect()
    }
    want = {
        tuple(r) for r in a.join(b, "tile")
        .select("tile", "doc_id", "n_pts", "min_doc").collect()
    }
    assert got == want and len(got) > 0


def test_bucketed_scan_exposes_bucket_spec(spark, tile_tables):
    ta, _, _, _ = tile_tables
    ddl = spark.sql(f"DESCRIBE TABLE EXTENDED {ta}").toPandas()
    txt = " ".join(str(v) for v in ddl["data_type"])
    assert "8" in txt and "tile" in txt  # Num Buckets / Bucket Columns
