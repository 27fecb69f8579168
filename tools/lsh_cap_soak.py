"""Adversarial LSH hot-bucket soak: an identical-boilerplate flood is
the classic LSH blowup (every flood doc lands in the SAME bucket in
every band, emitting flood^2/2 candidate pairs).  This soak measures:

  - worst-bucket candidate fan-out, uncapped vs max_per_bucket capped;
  - recall of GENUINE (non-flood) near-dup pairs under the cap — the
    loss the cap's docstring documents;
  - wall time for candidate generation + exact-Jaccard verification.

Run: python tools/lsh_cap_soak.py [n_background] [flood] [cap]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from s2_geometry_rust_spark.operators.dedup import (  # noqa: E402
    lsh_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
)
from s2_geometry_rust_spark.session import get_spark  # noqa: E402

WORDS = [f"w{i}" for i in range(5000)]


def make_corpus(n_background: int, flood: int, n_pairs: int,
                seed: int = 42) -> list[tuple[int, str]]:
    rng = np.random.default_rng(seed)
    rows: list[tuple[int, str]] = []
    boiler = " ".join(WORDS[i % 40] for i in range(60))
    did = 0
    for _ in range(flood):                       # identical flood
        rows.append((did, boiler)); did += 1
    for _ in range(n_pairs):                     # genuine near-dups
        base = [WORDS[i] for i in rng.integers(0, len(WORDS), 60)]
        rows.append((did, " ".join(base))); did += 1
        mut = list(base)
        mut[int(rng.integers(0, 60))] = WORDS[int(rng.integers(0, len(WORDS)))]
        rows.append((did, " ".join(mut))); did += 1
    for _ in range(n_background):                # unrelated noise
        rows.append((
            did,
            " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), 60)),
        ))
        did += 1
    return rows


def main() -> None:
    n_background = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    flood = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    n_pairs = 300
    spark = get_spark("lsh-cap-soak", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.createDataFrame(
        make_corpus(n_background, flood, n_pairs), "doc_id long, text string"
    ).repartition(32).persist()
    docs.count()
    sigs = minhash_signatures(docs).persist()
    sigs.count()

    out: dict = {"n_docs": n_background + flood + 2 * n_pairs,
                 "flood": flood, "cap": cap}
    genuine = {(flood + 2 * i, flood + 2 * i + 1) for i in range(n_pairs)}

    for label, mpb in (("uncapped", None), ("capped", cap)):
        t0 = time.time()
        cands = lsh_candidate_pairs(sigs, max_per_bucket=mpb)
        n_cands = cands.count()
        t_cand = time.time() - t0
        t0 = time.time()
        ver = verify_jaccard(cands, docs, 0.8)
        pairs = {(r["doc_a"], r["doc_b"]) for r in ver.collect()}
        t_ver = time.time() - t0
        hit = len(genuine & pairs)
        flood_pairs = sum(1 for a, b in pairs if a < flood and b < flood)
        out[label] = {
            "candidates": n_cands,
            "verified_pairs": len(pairs),
            "flood_internal_pairs": flood_pairs,
            "genuine_recall": round(hit / n_pairs, 4),
            "sec_candidates": round(t_cand, 2),
            "sec_verify": round(t_ver, 2),
        }

    # worst-bucket bound check: capped candidate count from the flood
    # bucket must be <= n_bands * cap^2/2 (vs flood^2/2 uncapped)
    out["worst_bucket_bound"] = {
        "uncapped_flood_pairs_possible": flood * (flood - 1) // 2,
        "capped_flood_pairs_max": cap * (cap - 1) // 2,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
