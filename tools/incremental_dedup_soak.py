"""incremental_dedup soak: delta-batch-vs-index dedup at scale with
exactly-known planted decisions.

Corpus layout (deterministic, partition-independent):

- index: ids [0, n_index) — unique ~50-word docs (counter-hashed
  vocabulary, same generator family as dedup_soak).
- batch: ids [B, B + n_batch) with B = 1_000_000_000, four planted
  classes by id % 10:
    * 0 -> exact copy of index doc (id % n_index)        => exact_index
    * 1 -> near copy  of index doc (1 of 50 words mutated,
           shingle Jaccard ~0.88 >= 0.8)                 => near_index
    * 2 -> exact copy of batch doc (id - 1, class 1):
           the class-1 keeper survives exact and goes near => exact_batch
    * else -> fresh unique text                          => keep

Every decision (and its matched id) is therefore known in closed form;
the soak checks the FULL decision multiset and per-class matched-id
correctness, plus throughput, and runs the materialized-index-signature
path (signatures computed once, passed in — the production shape).

Usage: python tools/incremental_dedup_soak.py [n_index] [n_batch] [cpus]
"""

from __future__ import annotations

import os
import sys
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


def synth(spark, n_index: int, n_batch: int, partitions: int = 64):
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

    def gen_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            texts = []
            for i in ids:
                cls = i % 10
                if cls == 0:
                    texts.append(_text(_words_for(int(i) % n_index)))
                elif cls in (1, 2):
                    src = int(i) - (cls == 2)  # class 2 copies class 1
                    words = _words_for(src % n_index).copy()
                    mrng = np.random.default_rng(src + 7_000_019)
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
    batch = spark.range(B, B + n_batch, 1, partitions).mapInPandas(
        gen_batch, "doc_id long, text string"
    )
    return index, batch


def main(n_index: int = 200_000, n_batch: int = 100_000,
         cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.dedup import (
        incremental_dedup,
        minhash_signatures,
    )
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("incdedup-soak", cpus=cpus)
    index, batch = synth(spark, n_index, n_batch)
    index.persist().count()
    batch.persist().count()

    # production shape: index signatures materialized ONCE
    t0 = time.time()
    sigs = minhash_signatures(index, n_perm=128)
    sigs.persist().count()
    t_sig = time.time() - t0

    # n_bands=32 (4 rows/band): planted near copies sit at Jaccard
    # ~0.88-0.94, where the 16-band miss probability is ~8e-4 (≈16
    # misses at 20k planted — observed 11) but the 32-band one is
    # ~2e-13, so full recall is the expected outcome at any soak size.
    t0 = time.time()
    out = incremental_dedup(
        batch, index, threshold=0.8, n_bands=32, index_signatures=sigs
    )
    out.persist()
    counts = {
        r["decision"]: r["n"]
        for r in out.groupBy("decision").agg(F.count("*").alias("n")).collect()
    }
    dt = time.time() - t0

    exp = {
        "exact_index": sum(1 for i in range(B, B + n_batch) if i % 10 == 0),
        "near_index": sum(1 for i in range(B, B + n_batch) if i % 10 == 1),
        "exact_batch": sum(1 for i in range(B, B + n_batch) if i % 10 == 2),
    }
    exp["keep"] = n_batch - sum(exp.values())

    # matched-id spot invariants (full column checks, cheap aggregates)
    bad_exact_idx = out.filter(
        (F.col("decision") == "exact_index")
        & (F.col("matched_id") != (F.col("doc_id") % n_index))
    ).count()
    bad_near = out.filter(
        (F.col("decision") == "near_index")
        & (F.col("matched_id") != ((F.col("doc_id") - 0) % n_index))
        # near copies mutate index doc (doc_id % n_index): matched id
        # must be exactly that source (unique 50-word docs don't
        # cross-match at 0.8)
    ).count()
    bad_batch = out.filter(
        (F.col("decision") == "exact_batch")
        & (F.col("matched_id") != F.col("doc_id") - 1)
    ).count()

    # exact classes must match exactly; the near class is LSH-
    # probabilistic by design — require recall >= 0.999 (a miss lands
    # in 'keep') and zero spurious near decisions, and report the loss.
    near_missed = exp["near_index"] - counts.get("near_index", 0)
    ok = (
        counts.get("exact_index") == exp["exact_index"]
        and counts.get("exact_batch") == exp["exact_batch"]
        and 0 <= near_missed <= max(1, exp["near_index"] // 1000)
        and counts.get("keep", 0) == exp["keep"] + near_missed
        and not (bad_exact_idx or bad_near or bad_batch)
    )
    print(
        f"index={n_index} batch={n_batch} cpus={cpus} "
        f"sig_wall={t_sig:.1f}s dedup_wall={dt:.1f}s "
        f"({n_batch / dt:.0f} batch docs/s)"
    )
    print(f"decisions={counts}")
    print(f"expected ={exp}")
    print(
        f"matched-id violations: exact_index={bad_exact_idx} "
        f"near_index={bad_near} exact_batch={bad_batch}; "
        f"near misses={near_missed} "
        f"(recall={1 - near_missed / max(exp['near_index'], 1):.6f})"
    )
    print("RESULT:", "PASS" if ok else "FAIL")
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
