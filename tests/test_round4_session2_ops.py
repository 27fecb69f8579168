"""Round-4 session-2 operators: IVF-PQ ANN (production kmeans path),
SemDeDup semantic dedup (brute-force pair replay + kmeans path), and
Bloom decontamination (no-false-negative superset property).

The deterministic first-ids paths of all three are verified bit-exact
against independent DuckDB SQL by the contract gate (ann_ivfpq,
semantic_dedup, bloom_decontaminate); these tests cover what the gate
cannot: the kmeans-trained production inits and the semantic
properties.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


def _grid(mat: np.ndarray) -> np.ndarray:
    s = mat.astype(np.float64) * 1e6
    return np.trunc(s + np.copysign(0.5, s)).astype(np.int64)


def _load(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    pdf = emb.toPandas()
    ids = pdf["vec_id"].to_numpy(np.int64)
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return emb, ids, mat


def test_ivfpq_kmeans_recall(spark):
    """The production (kmeans-trained, rerank-completed) IVF-PQ must
    recover most of the true integer-grid L2 top-10 when probing most
    lists.  64-dim iid vectors are PQ's worst case (distance
    concentration — see test_ann_pq.py's identical caveat); the bar
    guards the machinery, not the data's geometry."""
    from s2_geometry_rust_spark.operators.similarity import ivfpq_topk

    emb, ids, mat = _load(spark)
    queries = emb.filter(F.col("vec_id") < 20)
    got = ivfpq_topk(queries, emb, 10, n_coarse=8, n_probe=6,
                     m=16, ks=64, init="kmeans", seed=3,
                     rerank=100).collect()
    v = _grid(mat)
    order = np.argsort(ids)
    v, ids_s = v[order], ids[order]
    hits = total = 0
    by_q: dict[int, set[int]] = {}
    for r in got:
        by_q.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    for q in range(20):
        qi = np.where(ids_s == q)[0][0]
        d = ((v - v[qi]) ** 2).sum(axis=1)
        mask = ids_s != q
        o = np.lexsort((ids_s[mask], d[mask]))[:10]
        want = set(int(x) for x in ids_s[mask][o])
        hits += len(want & by_q.get(q, set()))
        total += 10
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_ivfpq_first_ids_exact_within_probed(spark):
    """On the deterministic path, every reported adist must equal the
    independent numpy ADC distance for that (query, neighbor) pair."""
    from s2_geometry_rust_spark.operators.similarity import (
        _coarse_assign_int, ivfpq_topk,
    )

    emb, ids, mat = _load(spark)
    queries = emb.filter(F.col("vec_id") < 20)
    got = ivfpq_topk(queries, emb, 10, n_coarse=16, n_probe=4,
                     m=8, ks=16, init="first_ids").collect()
    v = _grid(mat)
    order = np.argsort(ids)
    v, ids_s = v[order], ids[order]
    coarse = v[:16]
    cb_src = v[16:32]
    cb = cb_src - coarse[_coarse_assign_int(cb_src, coarse)]
    m, sub = 8, 8
    books = cb.reshape(16, m, sub).transpose(1, 0, 2)
    bkt = _coarse_assign_int(v, coarse)
    res = (v - coarse[bkt]).reshape(len(v), m, sub)
    codes = ((res[:, :, None, :] - books[None]) ** 2).sum(axis=3).argmin(
        axis=2)
    for r in got:
        q, nb = int(r.query_id), int(r.neighbor_id)
        qres = (v[q] - coarse[bkt[nb]]).reshape(m, sub)
        lut = ((qres[:, None, :] - books) ** 2).sum(axis=2)
        want = int(lut[np.arange(m), codes[nb]].sum())
        assert int(r.adist) == want
        assert bkt[nb] in set(
            np.argsort(((v[q] - coarse) ** 2).sum(axis=1),
                       kind="stable")[:4]
        )


def test_semantic_dedup_matches_brute_pairs(spark):
    """Survivor set == the brute-force replay of the keep-lowest-id
    rule over exact integer cosine comparisons, and the kept set is
    non-empty and smaller than the input (t=0.3 drops planted
    near-dups at sf0.01)."""
    from s2_geometry_rust_spark.operators.similarity import (
        _coarse_assign_int, semantic_dedup,
    )

    emb, ids, mat = _load(spark)
    got = {int(r.vec_id): (int(r.cluster), bool(r.kept))
           for r in semantic_dedup(emb, threshold=0.3,
                                   n_clusters=16).collect()}
    v = _grid(mat)
    order = np.argsort(ids)
    v, ids_s = v[order], ids[order]
    cl = _coarse_assign_int(v, v[:16])
    t_num = 3000
    nrm = (v * v).sum(axis=1)
    kept_want = {}
    for c in range(16):
        members = np.where(cl == c)[0]
        for bi, b in enumerate(members):
            dropped = False
            for a in members[:bi]:
                dot = int((v[a] * v[b]).sum())
                if dot > 0 and dot * dot * 10**8 >= (
                        t_num * t_num * int(nrm[a]) * int(nrm[b])):
                    dropped = True
                    break
            kept_want[int(ids_s[b])] = (int(c), not dropped)
    assert got == kept_want
    n_kept = sum(1 for _, k in got.values() if k)
    assert 0 < n_kept < len(got)


def test_semantic_dedup_kmeans_path(spark):
    """The kmeans-clustered production path runs and keeps the dedup
    invariant: no two kept vectors in the same cluster are >= t
    cosine-similar (checked exactly on the integer grid)."""
    from s2_geometry_rust_spark.operators.similarity import semantic_dedup

    emb, ids, mat = _load(spark)
    rows = semantic_dedup(emb, threshold=0.3, n_clusters=8,
                          init="kmeans", seed=5).collect()
    v = _grid(mat)
    idx = {int(i): j for j, i in enumerate(ids)}
    nrm = (v * v).sum(axis=1)
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        if r.kept:
            by_cluster.setdefault(int(r.cluster), []).append(int(r.vec_id))
    checked = 0
    for members in by_cluster.values():
        for i, a in enumerate(members):
            for b in members[i + 1:]:
                ia, ib = idx[a], idx[b]
                dot = int((v[ia] * v[ib]).sum())
                assert not (dot > 0 and dot * dot * 10**8 >=
                            3000 * 3000 * int(nrm[ia]) * int(nrm[ib]))
                checked += 1
    assert checked > 100


def test_bloom_decontaminate_superset_of_exact(spark):
    """Bloom filters have no false negatives: every exactly-
    contaminated doc is flagged, and its Bloom gram count >= its exact
    count.  False positives exist by design (that's the fixed-size
    trade) and are deterministic — two runs agree exactly."""
    from s2_geometry_rust_spark.operators.vocab import (
        bloom_decontaminate, decontaminate,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    exact = {int(r.doc_id): int(r.n_contaminated_ngrams)
             for r in decontaminate(corpus, bench, n=3).collect()}
    bloom = {int(r.doc_id): int(r.n_flagged_ngrams)
             for r in bloom_decontaminate(corpus, bench, n=3,
                                          m_bits=4096,
                                          k_hashes=4).collect()}
    assert set(exact) <= set(bloom)
    for d, n in exact.items():
        assert bloom[d] >= n
    again = {int(r.doc_id): int(r.n_flagged_ngrams)
             for r in bloom_decontaminate(corpus, bench, n=3,
                                          m_bits=4096,
                                          k_hashes=4).collect()}
    assert bloom == again


def test_bloom_tighter_with_more_bits(spark):
    """Growing m_bits monotonically removes false positives; at
    m_bits large enough the flagged-doc set approaches the exact
    one (sanity on the FP-rate lever)."""
    from s2_geometry_rust_spark.operators.vocab import (
        bloom_decontaminate, decontaminate,
    )

    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 10)
    corpus = docs.filter(F.col("doc_id") >= 10)
    small = bloom_decontaminate(corpus, bench, n=3, m_bits=4096,
                                k_hashes=4).count()
    big = bloom_decontaminate(corpus, bench, n=3, m_bits=1 << 22,
                              k_hashes=4).count()
    exact = decontaminate(corpus, bench, n=3).count()
    assert exact <= big <= small
