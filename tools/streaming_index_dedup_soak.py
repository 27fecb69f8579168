"""streaming_index_dedup soak: multi-micro-batch stream vs a static
index at scale, exact-matched against the batch twin.

The stream source is written as many small parquet files and read with
maxFilesPerTrigger=1, so the run genuinely crosses micro-batch
boundaries — the watermark-bounded (doc_a, doc_b) pair-dedup state and
the stream-static joins are exercised across batches, not inside one.

Corpus: index = n_index unique docs (dedup_soak generator family);
stream = n_stream docs where id % 10 == 0 is an exact copy of index
doc (id % n_index), id % 10 == 1 a near copy (1 of 50 words mutated),
else fresh.  PASS = streamed decision rows == the batch operator's
exact_index rows + verified near pair set (the documented twin
relation), as exact set equality.

Usage: python tools/streaming_index_dedup_soak.py [n_index] [n_stream]
       [n_files] [cpus]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 1_000_000_000


def _words_for(base: int) -> np.ndarray:
    rng = np.random.default_rng(base + 1_000_003)
    return rng.integers(0, 50_000, 50)


def _text(words: np.ndarray) -> str:
    return " ".join(f"w{w}" for w in words)


def synth(spark, n_index: int, n_stream: int, partitions: int = 32):
    from collections.abc import Iterator

    def gen_index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": [_text(_words_for(int(i))) for i in ids],
                }
            )

    def gen_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            texts = []
            for i in ids:
                cls = i % 10
                if cls == 0:
                    texts.append(_text(_words_for(int(i) % n_index)))
                elif cls == 1:
                    words = _words_for(int(i) % n_index).copy()
                    mrng = np.random.default_rng(int(i) + 7_000_019)
                    words[mrng.choice(50, 1)[0]] = mrng.integers(
                        50_000, 60_000, 1
                    )[0]
                    texts.append(_text(words))
                else:
                    texts.append(_text(_words_for(int(i))))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    index = spark.range(0, n_index, 1, partitions).mapInPandas(
        gen_index, "doc_id long, text string"
    )
    stream_docs = spark.range(B, B + n_stream, 1, partitions).mapInPandas(
        gen_stream, "doc_id long, text string"
    )
    return index, stream_docs


def main(n_index: int = 200_000, n_stream: int = 50_000,
         n_files: int = 8, cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.dedup import (
        lsh_candidate_pairs_cross,
        minhash_signatures,
        verify_jaccard,
    )
    from s2_geometry_rust_spark.session import get_spark
    from s2_geometry_rust_spark.streaming import streaming_index_dedup

    spark = get_spark("stream-idx-dedup-soak", cpus=cpus)
    tmp = tempfile.mkdtemp(prefix="sidsoak_")
    try:
        index, stream_docs = synth(spark, n_index, n_stream)
        index.persist().count()
        with_ts = stream_docs.withColumn(
            "event_time",
            F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 100000),
        )
        src = f"{tmp}/src"
        # n_files separate writes -> n_files micro-batches at
        # maxFilesPerTrigger=1 (repartition(1) per slice keeps one
        # parquet file per slice)
        per = (n_stream + n_files - 1) // n_files
        for f in range(n_files):
            lo, hi = B + f * per, min(B + (f + 1) * per, B + n_stream)
            with_ts.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).repartition(1).write.mode("append").parquet(src)

        sigs = minhash_signatures(index, n_perm=128)
        sigs.persist().count()

        stream = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = streaming_index_dedup(
            stream, index, threshold=0.8, n_perm=128, n_bands=32,
            index_signatures=sigs,
        )
        t0 = time.time()
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("sid_soak")
            .option("checkpointLocation", f"{tmp}/cp")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(560)
        n_batches = len(q.recentProgress)
        dt = time.time() - t0
        got = spark.sql(
            "SELECT doc_id, decision, matched_id, jaccard FROM sid_soak"
        )
        streamed = {
            (r["doc_id"], r["decision"], r["matched_id"],
             round(r["jaccard"], 12))
            for r in got.collect()
        }

        # batch twin
        bdocs = spark.read.parquet(src).drop("event_time")
        idx_md5 = index.groupBy(F.md5("text").alias("tmd5")).agg(
            F.min("doc_id").alias("idx_match")
        )
        tagged = bdocs.withColumn("tmd5", F.md5("text")).join(
            idx_md5, "tmd5", "left"
        )
        exact = {
            (r["doc_id"], "exact_index", r["idx_match"], 1.0)
            for r in tagged.filter(F.col("idx_match").isNotNull()).collect()
        }
        surv = tagged.filter(F.col("idx_match").isNull()).select(
            "doc_id", "text"
        )
        verified = verify_jaccard(
            lsh_candidate_pairs_cross(
                minhash_signatures(surv, n_perm=128), sigs, 32, 128
            ),
            surv.unionByName(index.select("doc_id", "text")), 0.8,
        ).collect()
        want = exact | {
            (r["doc_a"], "near_index", r["doc_b"], round(r["jaccard"], 12))
            for r in verified
        }

        ok = streamed == want and n_batches >= n_files
        print(
            f"index={n_index} stream={n_stream} files={n_files} "
            f"cpus={cpus} micro_batches={n_batches} wall={dt:.1f}s "
            f"({n_stream / dt:.0f} streamed docs/s)"
        )
        print(
            f"streamed rows={len(streamed)} twin rows={len(want)} "
            f"only_stream={len(streamed - want)} only_twin={len(want - streamed)}"
        )
        print("RESULT:", "PASS" if ok else "FAIL")
        if not ok:
            sys.exit(1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
