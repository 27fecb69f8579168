"""Iceberg catalog wiring (sources/iceberg.py): config builder,
runtime probe, unified write/read with parquet fallback, and the
checkpoint table:URI routing.

In this sandbox the Iceberg runtime jars are absent, so the fallback
path executes; on a cluster with the runtime on the classpath the same
calls go through ``df.writeTo(<catalog>.<db>.<name>)``.  The tests
assert the dual-path contract, not jar presence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from s2_geometry_rust_spark.sources.iceberg import (
    iceberg_available,
    iceberg_configs,
    iceberg_submit_flags,
    read_table,
    table_exists,
    write_table,
)
from s2_geometry_rust_spark.plans.checkpoints import (
    resume_filter,
    write_stage_checkpoint,
)
from s2_geometry_rust_spark.sources import extract_geo_points, synth_documents


def test_iceberg_configs_complete():
    cfg = iceberg_configs("/wh", catalog="cat")
    assert cfg["spark.sql.catalog.cat"] == "org.apache.iceberg.spark.SparkCatalog"
    assert cfg["spark.sql.catalog.cat.type"] == "hadoop"
    assert cfg["spark.sql.catalog.cat.warehouse"] == "/wh"
    assert "IcebergSparkSessionExtensions" in cfg["spark.sql.extensions"]
    flags = iceberg_submit_flags("/wh", catalog="cat")
    for k, v in cfg.items():
        assert f"--conf {k}={v}" in flags


def test_availability_probe_is_boolean(spark):
    avail = iceberg_available(spark)
    assert isinstance(avail, bool)


def test_write_read_roundtrip_and_append(spark, tmp_path):
    wh = str(tmp_path / "warehouse")
    df = spark.range(10).withColumn("v", F.col("id") * 2)
    assert not table_exists(spark, "t1", wh)
    write_table(df, "t1", wh, mode="append")
    assert table_exists(spark, "t1", wh)
    got = read_table(spark, "t1", wh)
    assert got.count() == 10
    assert {r["v"] for r in got.collect()} == {2 * i for i in range(10)}
    # append accumulates
    write_table(df, "t1", wh, mode="append")
    assert read_table(spark, "t1", wh).count() == 20
    # replace resets
    write_table(df.limit(3), "t1", wh, mode="replace")
    assert read_table(spark, "t1", wh).count() == 3


def test_checkpoint_table_uri_resume(spark, tmp_path):
    """The kill/resume protocol is unchanged when the checkpoint table
    is addressed through the catalog layer (table:<warehouse>:<name>)."""
    from s2_geometry_rust_spark.operators.tiling import with_tile

    docs = synth_documents(spark, 200, seed=7)
    work = with_tile(extract_geo_points(docs), 2)
    uri = f"table:{tmp_path / 'wh'}:checkpoints"
    tiles = sorted(r["tile_id"] for r in work.select("tile_id").distinct().collect())
    done_tiles = tiles[: len(tiles) // 2]
    done = work.filter(F.col("tile_id").isin(done_tiles))
    write_stage_checkpoint(done, "stage1", "tile_id", "cell_id", uri,
                           lineage="uri-run")
    remaining = resume_filter(work, spark, "stage1", uri, "tile_id")
    rem = {r["tile_id"] for r in remaining.select("tile_id").distinct().collect()}
    assert rem == set(tiles) - set(done_tiles)
    # metrics and the post-action stage_total sentinel both present
    cp = read_table(spark, "checkpoints", str(tmp_path / "wh"))
    assert cp.filter(F.col("lineage") == "uri-run").count() == len(done_tiles)
    total = cp.filter(F.col("lineage").endswith("#stage_total")).collect()
    assert len(total) == 1 and total[0]["latency_ms"] > 0
