"""Product-quantization ANN: independent numpy replay of the
deterministic path, L2 recall of the kmeans path, and the
compressed-domain size claim.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


def _grid(mat: np.ndarray) -> np.ndarray:
    s = mat.astype(np.float64) * 1e6
    return np.trunc(s + np.copysign(0.5, s)).astype(np.int64)


def _numpy_pq(vecs: np.ndarray, ids: np.ndarray, qids: np.ndarray,
              k: int, m: int, ks: int):
    """Straight-line PQ reimplementation (no batching, no Spark)."""
    v = _grid(vecs)
    order = np.argsort(ids)
    cb = v[order[:0]]  # placeholder
    first = np.isin(ids, np.arange(ks))
    cb = v[first][np.argsort(ids[first])]
    n, dim = v.shape
    sub = dim // m
    vs = v.reshape(n, m, sub)
    bs = cb.reshape(ks, m, sub).transpose(1, 0, 2)
    d = ((vs[:, :, None, :] - bs[None]) ** 2).sum(axis=3)  # (n, m, ks)
    codes = d.argmin(axis=2)
    out = []
    for q in qids:
        qi = np.where(ids == q)[0][0]
        lut = d[qi]  # (m, ks) — query's own subspace distances
        ad = lut[np.arange(m)[None, :], codes].sum(axis=1)
        mask = ids != q
        cand_ids, cand_ad = ids[mask], ad[mask]
        o = np.lexsort((cand_ids, cand_ad))[:k]
        for r, i in enumerate(o, start=1):
            out.append((int(q), int(cand_ids[i]), r, int(cand_ad[i])))
    return sorted(out)


def test_pq_matches_independent_numpy(spark):
    from s2_geometry_rust_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    got = sorted(
        (int(r.query_id), int(r.neighbor_id), int(r.rank), int(r.adist))
        for r in pq_topk(queries, emb, 10, m=8, ks=16,
                         init="first_ids").collect()
    )
    pdf = emb.toPandas()
    want = _numpy_pq(
        np.stack(pdf["embedding"].to_numpy()),
        pdf["vec_id"].to_numpy(np.int64),
        np.arange(20), 10, 8, 16,
    )
    assert got == want


def test_pq_kmeans_recall_vs_exact_l2(spark):
    from s2_geometry_rust_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    approx = pq_topk(queries, emb, 10, m=16, ks=64,
                     init="kmeans", rerank=100).toPandas()
    pdf = emb.toPandas()
    v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy(np.int64)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = []
    for q in range(20):
        qi = np.where(ids == q)[0][0]
        d = ((v - v[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        exact = set(ids[np.argsort(d)[:10]].tolist())
        recalls.append(len(exact & a.get(q, set())) / 10)
    # 64-dim iid vectors are PQ's worst case: distance concentration
    # makes the true top-10 barely closer than the rest, so recall is
    # shortlist-membership-bound (measured: plateaus ~0.6 at R>=100
    # regardless of further rerank depth).  Real embedding corpora are
    # clustered and do far better; the bar here guards the machinery,
    # not the data's geometry.
    assert float(np.mean(recalls)) >= 0.5, np.mean(recalls)


def test_pq_codes_are_m_small_ints(spark):
    """The compression claim: the scanned representation is m int codes
    (m bytes at ks<=256 in a real sink), never the raw vector."""
    from s2_geometry_rust_spark.operators.similarity import pq_topk

    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 2)
    plan = pq_topk(queries, emb, 3)._jdf.queryExecution().executedPlan().toString()
    # two Arrow passes (encode, scan) and no exchange of raw embeddings
    # between them: the only Exchange feeds the final tiny window
    assert plan.count("Exchange") == 1
