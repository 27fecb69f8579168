"""Exact n-gram-Jaccard (PPJoin prefix filter) soak: throughput +
planted-dup exactness at configurable scale.

Reuses dedup_soak's deterministic corpus: every 20th doc is a planted
near-copy of its predecessor (1 of 50 words mutated — 3-gram Jaccard
~0.88).  Because the operator is EXACT, the result must be exactly the
n/20 planted pairs (unrelated 50k-vocab docs share no 3-grams at
jaccard >= 0.5), so recall AND precision are both checkable to equality
— unlike the probabilistic minhash path, which only bounds recall.

Usage: python tools/ngram_jaccard_soak.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.dedup_soak import synth_text_docs  # noqa: E402


def synth_zipf_docs(spark, n: int, vocab: int = 50_000,
                    partitions: int = 64):
    """Skewed shared-vocabulary corpus: word = floor(vocab * u^4), so
    the hottest word draws ~6.7% of all tokens and the top-100 ~21% —
    the adversarial regime for a gram-keyed self-join.  Every 20th doc
    is still a planted near-copy of its predecessor (1 of 50 words
    mutated into a disjoint id range), so exactness stays checkable."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            rows_id, rows_text = [], []
            for i in ids:
                base = i - (i % 20 == 19)
                rng = np.random.default_rng(base + 2_000_003)
                words = (vocab * rng.random(50) ** 4).astype(np.int64)
                if i != base:
                    mrng = np.random.default_rng(i + 9_000_019)
                    pos = mrng.choice(50, 1, replace=False)
                    words = words.copy()
                    words[pos] = mrng.integers(vocab, vocab + 10_000, 1)
                rows_id.append(int(i))
                rows_text.append(" ".join(f"w{w}" for w in words))
            yield pd.DataFrame({"doc_id": rows_id, "text": rows_text})

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(gen, "doc_id long, text string")
    )


def main(n: int = 200_000, cpus: int = 16, zipf: bool = False) -> None:
    from s2_geometry_rust_spark.operators.dedup import ngram_jaccard_pairs
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("ngjac-soak", cpus=cpus)
    docs = (synth_zipf_docs if zipf else synth_text_docs)(spark, n)
    docs.persist().count()
    sz = int(
        docs.select("doc_id", "text")
        ._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    print(f"catalyst size estimate: {sz/1e6:.1f} MB "
          f"-> auto materialize_grams={'True' if sz > 64*1024*1024 else 'False'}")
    n_cand = ngram_jaccard_pairs(docs, threshold=0.5,
                                 candidates_only=True).count()
    print(f"prefix-filtered candidates: {n_cand} "
          f"({n_cand / max(n // 20, 1):.2f}x planted)")
    t0 = time.time()
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)  # auto heuristic
    got = pairs.select("doc_a", "doc_b").toPandas()
    dt = time.time() - t0
    expected = {(i - 1, i) for i in range(n) if i % 20 == 19}
    found = {(int(a), int(b)) for a, b in got.itertuples(index=False)}
    print(f"n={n} zipf={zipf} pairs_found={len(found)} expected={len(expected)}")
    print(f"missing={len(expected - found)} spurious={len(found - expected)}")
    print(f"wall={dt:.1f}s  docs/s={n / dt:,.0f}")
    assert found == expected, "exact operator must return exactly the planted pairs"
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
        zipf="--zipf" in sys.argv,
    )
