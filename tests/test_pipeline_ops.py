"""Training-data pipeline operators: dedup, text analysis, similarity
search, multimodal plumbing."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2_geometry_rust_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dedup_minhash,
    simhash_signatures,
)
from s2_geometry_rust_spark.operators.multimodal import (
    extract_media_features,
    media_spans,
)
from s2_geometry_rust_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_bucketed_topk,
)
from s2_geometry_rust_spark.operators.text import (
    fingerprints,
    with_lang_id,
    with_quality_score,
    with_token_count,
)
from s2_geometry_rust_spark.sources import synth_documents


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_exact_dedup_counts(spark):
    rows = [(1, "aaa bbb"), (2, "aaa bbb"), (3, "ccc"), (4, "aaa bbb"), (5, "ccc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = exact_dedup(df).toPandas().sort_values("n_copies", ascending=False)
    assert got.n_copies.tolist() == [3, 2]
    assert got.keeper.tolist() == [1, 3]


def test_minhash_near_dedup_finds_planted_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 6
    rows = [(i, base) for i in range(3)]  # identical triplet
    near = base.replace("lazy", "sleepy", 1)  # one-word edit -> J ~ 0.8
    rows += [(10, near)]
    rows += [(20 + i, f"totally different text number {i} with words " * 5)
             for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = near_dedup_minhash(df, threshold=0.5, n_bands=32).toPandas()
    found = {tuple(sorted(p)) for p in zip(pairs.doc_a, pairs.doc_b)}
    assert (0, 1) in found and (0, 2) in found and (1, 2) in found
    assert any(10 in p for p in found)  # near-dup caught
    assert not any((a >= 20 and b >= 20) for a, b in found)


def test_minhash_signature_determinism(spark):
    rows = [(i, f"some document text {i % 3} repeated tokens") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = minhash_signatures(df.repartition(1)).toPandas().sort_values("doc_id")
    b = minhash_signatures(df.repartition(5)).toPandas().sort_values("doc_id")
    for x, y in zip(a.sig, b.sig):
        assert list(x) == list(y)
    # identical docs (i%3 equal) share signatures
    sig_by_doc = {r.doc_id: tuple(r.sig) for r in a.itertuples()}
    assert sig_by_doc[0] == sig_by_doc[3] == sig_by_doc[18]


def test_simhash_close_for_similar(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "completely unrelated words here banana orange"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = simhash_signatures(df).toPandas().set_index("doc_id")
    h1 = np.uint64(np.int64(got.loc[1, "simhash"]))
    h2 = np.uint64(np.int64(got.loc[2, "simhash"]))
    h3 = np.uint64(np.int64(got.loc[3, "simhash"]))
    d12 = bin(int(h1 ^ h2)).count("1")
    d13 = bin(int(h1 ^ h3)).count("1")
    assert d12 < d13


def test_text_analysis_columns(spark, docs):
    out = with_lang_id(with_quality_score(with_token_count(docs))).toPandas()
    assert (out.n_tokens > 0).all()
    assert out.quality_score.between(0, 1).all()
    assert set(out.lang_pred.unique()) <= {"en", "de", "fr", "es", "und"}
    # token count matches python split
    for _, r in out.head(20).iterrows():
        assert r.n_tokens == len(r.text.split())


def test_fingerprints_stable_and_distinct(spark, docs):
    a = fingerprints(docs.repartition(1)).toPandas().sort_values("doc_id")
    b = fingerprints(docs.repartition(4)).toPandas().sort_values("doc_id")
    np.testing.assert_array_equal(a.fingerprint.values, b.fingerprint.values)
    assert a.fingerprint.nunique() > 0.9 * len(a)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_topk_bruteforce_matches_numpy(spark, embeddings):
    k = 5
    queries = embeddings.filter(F.col("vec_id") < 10)
    got = cosine_topk_bruteforce(queries, embeddings, k).toPandas()
    pdf = embeddings.toPandas().sort_values("vec_id")
    mat = np.array(list(pdf.embedding), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf.vec_id.to_numpy()
    for qi in range(10):
        cos = mat @ mat[qi]
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))[:k]
        g = got[got.query_id == qi].sort_values("rank")
        np.testing.assert_array_equal(g.neighbor_id.to_numpy(), ids[order])


def test_lsh_bucketed_topk_recall(spark, embeddings):
    k = 5
    queries = embeddings.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(queries, embeddings, k).toPandas()
    ann = lsh_bucketed_topk(queries, embeddings, k, n_bits=6).toPandas()
    hits = 0
    denom = 0
    for qi in exact.query_id.unique():
        e = set(exact[exact.query_id == qi].neighbor_id)
        a = set(ann[ann.query_id == qi].neighbor_id)
        hits += len(e & a)
        denom += len(e)
    assert denom > 0
    assert hits / denom >= 0.3  # 6-bit single-table LSH: modest recall


def test_multimodal_plumbing(spark):
    docs = synth_documents(spark, 300, seed=42)
    spans = media_spans(docs)
    feats = extract_media_features(spans).toPandas()
    if len(feats) == 0:
        pytest.skip("no media spans generated")
    assert set(feats.modality.unique()) <= {"image", "audio", "video"}
    assert (feats.features.apply(len) == 8).all()
    # keyed back to documents without touching spans
    joined = docs.join(
        extract_media_features(media_spans(docs)).groupBy("doc_id").count(),
        "doc_id",
        "left",
    )
    assert joined.count() == 300


def test_cosine_threshold_pairs_exact_matches_numpy(spark):
    from s2_geometry_rust_spark.operators.similarity import (
        cosine_threshold_pairs_exact,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = cosine_threshold_pairs_exact(emb, 0.4).toPandas()
    pdf = emb.toPandas()
    m = np.array(list(pdf.embedding), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1)[:, None]
    ids = pdf.vec_id.to_numpy()
    cos = m @ m.T
    want = set()
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and cos[i, j] >= 0.4:
                want.add((ids[i], ids[j]))
    assert set(map(tuple, got[["vec_a", "vec_b"]].itertuples(index=False))) == want


def test_cosine_threshold_pairs_lsh_recall_on_planted_dups(spark):
    """LSH near-dup scale path: planted 0.95+-cosine duplicates must be
    recovered with high recall (8-bit x 8-table hyperplane buckets)."""
    from s2_geometry_rust_spark.operators.similarity import (
        cosine_threshold_pairs_lsh,
    )

    rng = np.random.default_rng(3)
    base = rng.normal(size=(100, 64))
    base /= np.linalg.norm(base, axis=1)[:, None]
    dups = base[:40] + rng.normal(scale=0.03, size=(40, 64))
    dups /= np.linalg.norm(dups, axis=1)[:, None]
    vecs = np.concatenate([base, dups])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_threshold_pairs_lsh(df, 0.9, n_bits=8, n_tables=8,
                                     dim=64).toPandas()
    found = set(map(tuple, got[["vec_a", "vec_b"]].itertuples(index=False)))
    planted = {(i, 100 + i) for i in range(40)}
    # float32 storage shifts cosines slightly: count only planted pairs
    # whose float32 cosine is actually >= 0.9
    v32 = np.array([np.asarray(r[1], np.float32) for r in rows], np.float64)
    v32 /= np.linalg.norm(v32, axis=1)[:, None]
    truth = {p for p in planted if (v32[p[0]] @ v32[p[1]]) >= 0.9}
    recall = len(found & truth) / max(len(truth), 1)
    assert recall >= 0.9, (recall, len(truth))
    # and no false positives below the threshold
    for (a, b) in found:
        assert v32[a] @ v32[b] >= 0.9 - 1e-9


def test_ivf_topk_recall_vs_bruteforce(spark):
    from s2_geometry_rust_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(queries, emb, 10).toPandas()
    approx = ivf_topk(queries, emb, 10, n_centroids=32, n_probe=16).toPandas()
    e = exact.groupby("query_id")["neighbor_id"].apply(set)
    a = approx.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e.index]
    # ~0.84 at 32 centroids / 16 probes on this near-uniform corpus
    # (random embeddings are IVF's worst case: neighbors are not
    # clustered, so recall is bounded by probed-list coverage)
    assert np.mean(recalls) >= 0.75, np.mean(recalls)


def test_driver_bound_guard_raises_past_bound(spark):
    """The driver-collected BASELINE operators refuse sides past the
    documented bound, naming the distributed twin (r4 verdict: nothing
    previously enforced the documented ~1e5-row limit)."""
    from s2_geometry_rust_spark.operators.similarity import (
        DriverBoundExceeded,
        guard_driver_bound,
    )

    df = spark.range(0, 50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 4).alias("embedding"),
    )
    guard_driver_bound(df, "op", "twin", bound=50)  # at bound: fine
    with pytest.raises(DriverBoundExceeded, match="twin_op"):
        guard_driver_bound(df, "op", "twin_op", bound=49)


def test_driver_bound_guard_wired_into_baselines(spark):
    """cosine_topk_bruteforce and knn_bruteforce actually call the
    guard (monkeypatched bound)."""
    from s2_geometry_rust_spark.operators import knn, similarity

    df = spark.range(0, 30).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") % 7).cast("double")] * 4).alias("embedding"),
    )
    pts = spark.range(0, 30).select(
        F.col("id").alias("query_id"), F.col("id").alias("cand_id"),
        F.lit(1.0).alias("x"), F.lit(0.0).alias("y"), F.lit(0.0).alias("z"),
    )
    old = similarity.MAX_DRIVER_SIDE_ROWS
    similarity.guard_driver_bound.__defaults__ = (10,)
    try:
        with pytest.raises(similarity.DriverBoundExceeded):
            similarity.cosine_topk_bruteforce(df, df, k=3).collect()
        with pytest.raises(similarity.DriverBoundExceeded):
            knn.knn_bruteforce(pts, pts, k=3).collect()
    finally:
        similarity.guard_driver_bound.__defaults__ = (old,)
    assert similarity.cosine_topk_bruteforce(df, df, k=3).count() > 0
