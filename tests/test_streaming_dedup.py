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


def test_streaming_sessions_match_batch(spark, tmp_path):
    """Session spans + aggregates from F.session_window equal the batch
    sessionizer's (same gap, boundary included: both use the half-open
    >= convention)."""
    import pandas as pd
    from s2_geometry_rust_spark.operators.events import session_stats
    from s2_geometry_rust_spark.streaming import streaming_session_stats

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(tmp_path / "sess_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_session_stats(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = (
        spark.sql("SELECT * FROM sess_stream")
        .toPandas()
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )
    want = (
        session_stats(ev)
        .select("user_id", "n_events", "start_ts", "end_ts", "sum_cents")
        .toPandas()
        .sort_values(["user_id", "start_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_streaming_corpus_filter_matches_batch_gates(spark, tmp_path):
    """Survivor key set == batch gates (quality + lang + exact dedup by
    content hash) on the same documents."""
    from s2_geometry_rust_spark.operators.text import (
        with_lang_id,
        with_quality_score,
    )
    from s2_geometry_rust_spark.streaming.dedup import (
        streaming_corpus_filter,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .withColumn(
            "event_time",
            F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")),
        )
    )
    src = str(tmp_path / "corpus_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        streaming_corpus_filter(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("corpus_stream")
        .option("checkpointLocation", str(tmp_path / "corpus_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM corpus_stream").toPandas()

    batch = with_lang_id(with_quality_score(spark.read.parquet(src)))
    gated = batch.filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") == "en")
    ).withColumn("text_md5", F.md5("text"))
    want_keys = {r["text_md5"] for r in gated.select("text_md5").distinct().collect()}
    assert set(got["text_md5"]) == want_keys
    assert len(got) == len(want_keys)  # exactly one survivor per key
    # survivors must individually pass the gates
    assert (got["quality_score"] >= 0.5).all()
    assert (got["lang_pred"] == "en").all()
