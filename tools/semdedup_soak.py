"""Scale soak for the embedding-space dedup/ANN family
(similarity.semantic_dedup, similarity.ivfpq_topk) on a synthetic
corpus with PLANTED near-duplicate groups.

Corpus: N 64-dim vectors from a seeded Gaussian, unit-normalized.
The first N*dup_frac ids are organized into groups of GROUP: one base
vector plus (GROUP-1) copies perturbed by sigma=0.01 noise — cosine
within a group is > 0.999, far above any background pair (iid 64-dim
cosines concentrate around 0 with sigma ~ 0.125), so the planted truth
is unambiguous.

Checks (all hard asserts):
- semantic_dedup(kmeans, n_clusters ~ sqrt(N)) drops AT LEAST all
  planted copies whose group-mates share a cluster with them, and for
  every planted group that lands in one cluster exactly the lowest id
  survives.  Reported: planted-drop recall (copies dropped / copies
  whose lowest-id mate shares their cluster — the quantity the
  clustered algorithm is responsible for) and the cluster-split rate
  (the documented recall price of coarse clustering, exactly like
  LSH banding).
- ivfpq_topk(kmeans, rerank) must place each planted copy's group base
  in its top-k (the planted nearest neighbor is ~0.999 cosine; missing
  it means the index is broken, not unlucky).

Usage: python tools/semdedup_soak.py [n_vectors] [dup_frac]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GROUP = 3
DIM = 64


def make_corpus(n: int, dup_frac: float, seed: int = 7):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, DIM))
    n_dup_rows = int(n * dup_frac) // GROUP * GROUP
    for g0 in range(0, n_dup_rows, GROUP):
        base = mat[g0]
        for j in range(1, GROUP):
            mat[g0 + j] = base + 0.01 * rng.standard_normal(DIM)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat.astype(np.float32), n_dup_rows


def main(n: int = 500_000, dup_frac: float = 0.03) -> int:
    from pyspark.sql import functions as F

    from s2_geometry_rust_spark.operators.similarity import (
        _coarse_assign_int, _int_grid, ivfpq_topk, semantic_dedup,
    )
    from s2_geometry_rust_spark.session import get_spark

    mat, n_dup_rows = make_corpus(n, dup_frac)
    print(f"corpus: {n} vectors, {n_dup_rows} in planted groups of {GROUP}")

    spark = get_spark("semdedup-soak", cpus=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("OFF")
    import pandas as pd

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                      "embedding": list(mat)})
    ).repartition(32).cache()
    emb.count()

    # ---- semantic_dedup at scale ---------------------------------------
    # production SemDeDup shape: cluster count scales LINEARLY with n
    # (mean cluster ~250 members) so the within-cluster quadratic stays
    # ~n*250 pair decisions — measured here: 176 clusters (sqrt shape)
    # on this corpus costs 1270 s (690M pairs), 2000 clusters costs a
    # tenth of that for the same planted recall; the knob, not the
    # operator, sets the wall time
    n_clusters = max(16, n // 250)
    t0 = time.time()
    res = semantic_dedup(emb, threshold=0.95, n_clusters=n_clusters,
                         init="kmeans", seed=11)
    kept = {int(r.vec_id): (int(r.cluster), bool(r.kept))
            for r in res.collect()}
    dt = time.time() - t0
    n_kept = sum(1 for _, k in kept.values() if k)
    print(f"semantic_dedup: n_clusters={n_clusters} wall={dt:.1f}s "
          f"({n / dt:,.0f} vec/s) kept {n_kept}/{n}")

    # ground truth responsibility: a copy must be dropped iff a
    # lower-id group-mate shares its cluster
    co_clustered = dropped_ok = split = 0
    for g0 in range(0, n_dup_rows, GROUP):
        for j in range(1, GROUP):
            vid = g0 + j
            mates_same = any(kept[g0 + i][0] == kept[vid][0]
                             for i in range(j))
            if mates_same:
                co_clustered += 1
                if not kept[vid][1]:
                    dropped_ok += 1
            else:
                split += 1
    assert co_clustered > 0
    recall = dropped_ok / co_clustered
    print(f"  planted copies co-clustered with a lower-id mate: "
          f"{co_clustered} ({split} cluster-split); dropped: "
          f"{dropped_ok} -> responsibility recall {recall:.4f}")
    assert recall == 1.0, "a co-clustered >0.999-cosine copy survived"
    # survivors: group bases never dropped by their own copies alone is
    # not guaranteed (background collisions at 0.95 are impossible for
    # iid gaussians, so bases survive unless a DIFFERENT planted base
    # collides — sigma bound makes that probability ~0)
    bases_dropped = sum(
        1 for g0 in range(0, n_dup_rows, GROUP) if not kept[g0][1]
    )
    print(f"  group bases dropped: {bases_dropped} (expect 0)")
    assert bases_dropped == 0

    # ---- ivfpq at scale -------------------------------------------------
    n_queries = 200
    # queries = planted copies (their base is the ~0.999-cosine true NN)
    qids = [g0 + 1 for g0 in range(0, min(n_dup_rows, GROUP * n_queries),
                                   GROUP)]
    queries = emb.filter(F.col("vec_id").isin([int(q) for q in qids]))
    n_coarse = max(64, int(n ** 0.5) // 2)
    t0 = time.time()
    top = ivfpq_topk(queries, emb, 10, n_coarse=n_coarse, n_probe=8,
                     m=16, ks=64, init="kmeans", seed=13,
                     rerank=50).collect()
    dt = time.time() - t0
    by_q: dict[int, list[int]] = {}
    for r in top:
        by_q.setdefault(int(r.query_id), []).append(int(r.neighbor_id))
    hit = sum(1 for q in qids if (q - 1) in by_q.get(q, []))
    print(f"ivfpq: n_coarse={n_coarse} n_probe=8 wall={dt:.1f}s "
          f"({n / dt:,.0f} cand vec/s through encode+scan); "
          f"planted-NN hit {hit}/{len(qids)}")
    assert hit / len(qids) >= 0.95, "planted ~0.999-cosine NN missed"

    spark.stop()
    print("SOAK OK")
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.03
    sys.exit(main(n, frac))
