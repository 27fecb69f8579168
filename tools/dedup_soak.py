"""MinHash-LSH near-dedup soak: throughput + planted-dup recall at
configurable scale, for the linear-scaling evidence table in
BASELINE.md (run at two sizes / two parallelism levels).

Synthesizes N deterministic ~50-word documents (counter-hashed
vocabulary, partition-independent); every 20th document is a planted
near-copy of its predecessor (1 of 50 words mutated — 3-word-shingle
Jaccard ~0.88, above the 0.8 threshold), so expected pair count scales as N/20 and
recall is checkable exactly.

Usage: python tools/dedup_soak.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_text_docs(spark, n: int, partitions: int = 64):
    from collections.abc import Iterator

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            rows_id, rows_text = [], []
            for i in ids:
                base = i - (i % 20 == 19)  # every 20th copies predecessor
                rng = np.random.default_rng(base + 1_000_003)
                words = rng.integers(0, 50_000, 50)
                if i != base:  # mutate 1 word deterministically
                    mrng = np.random.default_rng(i + 7_000_019)
                    pos = mrng.choice(50, 1, replace=False)
                    words = words.copy()
                    words[pos] = mrng.integers(50_000, 60_000, 1)
                rows_id.append(int(i))
                rows_text.append(" ".join(f"w{w}" for w in words))
            yield pd.DataFrame({"doc_id": rows_id, "text": rows_text})

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, "doc_id long, text string")
    )


def main(n: int = 100_000, cpus: int = 16) -> None:
    from s2_geometry_rust_spark.operators.dedup import near_dedup_minhash
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("dedup-soak", cpus=cpus)
    docs = synth_text_docs(spark, n)
    docs.persist().count()
    t0 = time.time()
    pairs = near_dedup_minhash(docs, threshold=0.8)
    found = pairs.count()
    dt = time.time() - t0
    planted = n // 20
    print(
        f"docs={n} cpus={cpus} pairs={found} planted~={planted} "
        f"wall={dt:.1f}s ({n / dt:.0f} docs/s)"
    )
    spark.stop()


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
