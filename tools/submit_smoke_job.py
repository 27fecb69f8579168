"""Minimal cluster-style job: reads parquet, runs the spatial pipeline."""
from pyspark.sql import SparkSession

spark = SparkSession.builder.appName("s2spark-submit-smoke").getOrCreate()

from s2_geometry_rust_spark.sources import synth_documents, extract_geo_points
from s2_geometry_rust_spark.operators.tiling import tile_counts

docs = synth_documents(spark, 2000, seed=42, partitions=8)
tiles = tile_counts(extract_geo_points(docs), 6)
print("TILES_ROWS=" + str(tiles.count()))
spark.stop()
