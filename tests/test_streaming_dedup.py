"""Streaming dedup: watermark-bounded exact and simhash dedup match
the batch key definitions on the same data."""

from pyspark.sql import functions as F

from s2_geometry_rust_spark.streaming import (
    streaming_exact_dedup,
    streaming_simhash_dedup,
)


def _doc_rows(n_docs=120, n_distinct=30):
    texts = [
        f"document number {i} with some shared words the a of and body"
        for i in range(n_distinct)
    ]
    return [(i, texts[i % n_distinct]) for i in range(n_docs)]


def _run_stream(spark, tmp_path, build, name):
    docs = spark.createDataFrame(
        _doc_rows(), "doc_id long, text string"
    ).withColumn("event_time", F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")))
    src = str(tmp_path / f"{name}_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = build(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return docs, spark.sql(f"SELECT * FROM {name}").toPandas()


def test_streaming_exact_dedup_one_per_content(spark, tmp_path):
    docs, got = _run_stream(
        spark, tmp_path, lambda s: streaming_exact_dedup(s), "exact_dedup_stream"
    )
    want_keys = {
        r["k"] for r in docs.select(F.md5("text").alias("k")).distinct().collect()
    }
    assert set(got["text_md5"]) == want_keys
    assert len(got) == len(want_keys)  # exactly one survivor per content


def test_streaming_simhash_dedup_matches_batch_keys(spark, tmp_path):
    docs, got = _run_stream(
        spark, tmp_path, lambda s: streaming_simhash_dedup(s), "simhash_dedup_stream"
    )
    from s2_geometry_rust_spark.operators.dedup import simhash_signatures

    want_keys = {
        r["simhash"] for r in simhash_signatures(docs).distinct().collect()
    }
    assert set(got["simhash"]) == want_keys
    assert len(got) == len(want_keys)
