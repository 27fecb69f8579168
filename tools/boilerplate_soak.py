"""Boilerplate-coverage soak: throughput + planted-footer exactness.

Corpus: n docs of 50 random words from a 50k vocab; every doc whose
id % 10 < 3 gets the SAME 12-word license footer appended.  With a
50k vocabulary random 8-grams never repeat across docs (50k^8 space) —
EXCEPT at the footer junction: two footer docs whose last random word
collides (birthday pairs over the 50k vocab) share the 8-gram
"<word> lic0..lic6", extending their coverage one token left.  The
exact expectation is therefore: footer docs -> 12 covered tokens, or
13 for junction-collision docs (computed exactly in python from the
same seeds); everything else -> 0.  Checked to equality.

Usage: python tools/boilerplate_soak.py [n_docs] [cpus]
"""

from __future__ import annotations

import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FOOTER = " ".join(f"lic{j}" for j in range(12))


def synth_docs(spark, n: int, partitions: int = 64):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(dtype=np.int64)
            texts = []
            for i in ids:
                rng = np.random.default_rng(i + 9_000_011)
                words = " ".join(f"w{w}" for w in rng.integers(0, 50_000, 50))
                if i % 10 < 3:
                    words = words + " " + FOOTER
                texts.append(words)
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "doc_id long, text string"
    )


def main(n: int = 200_000, cpus: int = 16) -> None:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.text import boilerplate_coverage
    from s2_geometry_rust_spark.session import get_spark

    spark = get_spark("boilerplate-soak", cpus=cpus)
    docs = synth_docs(spark, n)
    docs.persist().count()
    t0 = time.time()
    out = boilerplate_coverage(docs, n=8, min_docs=2)
    agg = out.groupBy(
        (F.col("doc_id") % 10 < 3).alias("has_footer"), "covered_tokens"
    ).count().collect()
    dt = time.time() - t0
    dist = {(r["has_footer"], r["covered_tokens"]): r["count"] for r in agg}
    # exact expectation: junction 8-gram collisions among footer docs
    from collections import Counter

    last_word = {}
    for i in range(n):
        if i % 10 < 3:
            rng = np.random.default_rng(i + 9_000_011)
            last_word[i] = int(rng.integers(0, 50_000, 50)[-1])
    counts = Counter(last_word.values())
    n13 = sum(1 for i, w in last_word.items() if counts[w] >= 2)
    n12 = len(last_word) - n13
    expected = {(False, 0): n - len(last_word)}
    if n12:
        expected[(True, 12)] = n12
    if n13:
        expected[(True, 13)] = n13
    print(f"n={n} coverage distribution: {dist}")
    print(f"expected junction-collision docs: {n13}")
    print(f"wall={dt:.1f}s  docs/s={n / dt:,.0f}")
    assert dist == expected, (
        "coverage must be exactly the planted footer "
        "(+1 for junction collisions)"
    )
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )
