"""Streaming spatial join: stream x static point-in-region matches the
batch filter-and-refine join row-for-row on the same documents."""

from __future__ import annotations

import pandas as pd


def test_streaming_point_in_region_matches_batch(spark, tmp_path):
    from s2_geometry_rust_spark import fixtures
    from s2_geometry_rust_spark.operators.spatial_join import (
        point_in_region_join,
    )
    from s2_geometry_rust_spark.sources import (
        extract_geo_points,
        interleave_flat_documents,
    )
    from s2_geometry_rust_spark.streaming import streaming_point_in_region

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = interleave_flat_documents(flat)
    src = str(tmp_path / "docs_src")
    docs.write.parquet(src)

    regions = fixtures.loop_regions(
        spark, ["arctic_80", "antarctic_80", "candy_cane", "north_hemi"]
    ).unionByName(fixtures.cap_regions(spark))

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        streaming_point_in_region(stream, regions)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("pip_stream")
        .option("checkpointLocation", str(tmp_path / "pip_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("SELECT * FROM pip_stream")
        .toPandas()
        .sort_values(["doc_id", "span_idx", "region_id"])
        .reset_index(drop=True)
    )

    batch_docs = spark.read.parquet(src)
    want = (
        point_in_region_join(
            extract_geo_points(batch_docs), regions, max_cells=64
        )
        .select("doc_id", "span_idx", "region_id")
        .toPandas()
        .sort_values(["doc_id", "span_idx", "region_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 0  # the fixture regions must actually match
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_point_in_polygon_matches_batch(spark, tmp_path):
    """Polygon-with-holes regions through the streaming wrapper: the
    polygon refine dispatch must behave identically on the stream x
    static path (shell-minus-holes, any-poly)."""
    from s2_geometry_rust_spark import fixtures
    from s2_geometry_rust_spark.operators.spatial_join import (
        point_in_region_join,
    )
    from s2_geometry_rust_spark.sources import (
        extract_geo_points,
        interleave_flat_documents,
    )
    from s2_geometry_rust_spark.streaming import streaming_point_in_region

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = interleave_flat_documents(flat)
    src = str(tmp_path / "poly_docs_src")
    docs.write.parquet(src)

    regions = fixtures.polygon_regions(spark)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        streaming_point_in_region(stream, regions, max_cells=8)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("poly_stream")
        .option("checkpointLocation", str(tmp_path / "poly_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("SELECT * FROM poly_stream")
        .toPandas()
        .sort_values(["doc_id", "span_idx", "region_id"])
        .reset_index(drop=True)
    )
    want = (
        point_in_region_join(
            extract_geo_points(spark.read.parquet(src)), regions,
            max_cells=8,
        )
        .select("doc_id", "span_idx", "region_id")
        .toPandas()
        .sort_values(["doc_id", "span_idx", "region_id"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
