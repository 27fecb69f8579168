"""Streaming twin of the hashed-linear classifier: the derived-weights
path is a stateless scan -> mapInPandas plan, so it runs unchanged on a
streaming DataFrame; every micro-batch scores exactly as the batch
operator (same kernel, same weights derivation).
"""

import pandas as pd

from s2_geometry_rust_spark.operators.text import classifier_scores


def _doc_rows(n_docs=90):
    return [
        (i, f"doc {i} quality words the a of and body token{i % 7}")
        for i in range(n_docs)
    ]


def test_streaming_classifier_matches_batch(spark, tmp_path):
    docs = spark.createDataFrame(_doc_rows(), "doc_id long, text string")
    src = str(tmp_path / "cls_src")
    docs.write.parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        classifier_scores(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cls_stream")
        .option("checkpointLocation", str(tmp_path / "cls_cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.sql("SELECT * FROM cls_stream")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        classifier_scores(docs)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)
