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


def test_hilbert_layout_prunes_row_groups(spark, tmp_path):
    """write_hilbert_sorted's file-skipping claim, measured: a narrow
    cell-range scan on the sorted layout must materialize far fewer
    rows out of the parquet reader than the table holds (row-group
    min/max pruning + pushed filters), while an identical scan on a
    shuffled twin reads everything.  tools/layout_skipping_probe.py
    measures the full 4M-row version (70.6x fewer scan rows)."""
    import numpy as np

    from s2_geometry_rust_spark.functions.udfs import cell_id_from_latlng_deg
    from s2_geometry_rust_spark.kernels import cellid as ck
    from s2_geometry_rust_spark.sources.sinks import (
        read_cell_range,
        write_hilbert_sorted,
    )
    from tools.layout_skipping_probe import scan_output_rows

    n = 200_000
    rows = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            (-80.0 + 160.0 * (F.pmod(F.xxhash64("id"), F.lit(1000000)) / 1e6)
             ).alias("lat"),
            (-180.0 + 360.0 * (F.pmod(F.xxhash64("id", F.lit("g")),
                                      F.lit(1000000)) / 1e6)).alias("lng"),
        )
        .withColumn("cell_id", cell_id_from_latlng_deg("lat", "lng"))
    )
    path = str(tmp_path / "hs")
    write_hilbert_sorted(rows, path, num_partitions=16)
    cell = ck.from_face_pos_level(2, 0, 2)
    lo = int(np.uint64(ck.range_min(np.array([cell], np.uint64))[0]))
    hi = int(np.uint64(ck.range_max(np.array([cell], np.uint64))[0]))
    cnt = read_cell_range(spark, path, lo, hi).select(F.count("*"))
    matching = cnt.collect()[0][0]
    scanned = scan_output_rows(cnt)
    assert matching > 0
    assert scanned < n / 5, (scanned, n)  # reader pruned most of the table
