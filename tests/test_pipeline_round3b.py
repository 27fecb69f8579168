"""Round-3 session-4 additions: cross-document boilerplate coverage,
sequence chunking, KMV distinct sketch — semantic ground truth computed
independently in python (the DuckDB oracle covers the SQL-parity
side in the contract check)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _py_kmv_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_boilerplate_coverage_planted(spark):
    from s2_geometry_rust_spark.operators.text import boilerplate_coverage

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        # doc 1/2 share the 8-gram -> both fully covered on that span
        (1, shared + " tail1 tail2"),
        (2, "head1 " + shared),
        # doc 3: unique text, no coverage
        (3, "one two three four five six seven eight nine ten"),
        # doc 4: shorter than n -> no windows, no coverage
        (4, "tiny doc"),
        # doc 5/6: share a 9-token span -> two overlapping boilerplate
        # windows whose union covers 9 tokens, not 16
        (5, "p q r s t u v w x pad5"),
        (6, "pad6 p q r s t u v w x"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in boilerplate_coverage(df, n=8, min_docs=2).collect()
    }
    assert got[1]["n_tokens"] == 10 and got[1]["covered_tokens"] == 8
    assert got[1]["clean_tokens"] == 2
    assert got[2]["covered_tokens"] == 8
    assert got[3]["covered_tokens"] == 0 and got[3]["clean_tokens"] == 10
    assert got[4]["n_tokens"] == 2 and got[4]["covered_tokens"] == 0
    # overlap union: 9 covered from 2 windows of 8
    assert got[5]["covered_tokens"] == 9
    assert got[6]["covered_tokens"] == 9
    assert len(got) == 6


def test_boilerplate_min_docs_threshold(spark):
    from s2_geometry_rust_spark.operators.text import boilerplate_coverage

    span = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, span), (2, span), (3, span)], ["doc_id", "text"]
    )
    # appears in 3 docs: covered at min_docs=3, not at min_docs=4
    got3 = boilerplate_coverage(df, n=8, min_docs=3).collect()
    assert all(r["covered_tokens"] == 8 for r in got3)
    got4 = boilerplate_coverage(df, n=8, min_docs=4).collect()
    assert all(r["covered_tokens"] == 0 for r in got4)


def test_chunk_documents_matches_python(spark):
    from s2_geometry_rust_spark.operators.text import chunk_documents

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = chunk_documents(docs, window=16).collect()
    expected = {}
    for doc_id, text in texts.items():
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        n = len(toks)
        for i in range(0, (n + 15) // 16):
            ln = min(16, n - i * 16)
            expected[(doc_id, i)] = (n, ln, 16 - ln, toks[i * 16],
                                     toks[i * 16 + ln - 1])
    assert len(got) == len(expected)
    for r in got:
        n, ln, pad, first, last = expected[(r["doc_id"], r["chunk_idx"])]
        assert (r["n_tokens"], r["chunk_len"], r["pad_tokens"]) == (n, ln, pad)
        assert (r["first_token"], r["last_token"]) == (first, last)


def test_chunk_documents_edges(spark):
    from s2_geometry_rust_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "w"), (2, " ".join(f"t{i}" for i in range(64))),
         (3, " ".join(f"u{i}" for i in range(65))), (4, ""), (5, "   ")],
        ["doc_id", "text"],
    )
    got = chunk_documents(df, window=64).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 4 not in by_doc and 5 not in by_doc  # empty docs dropped
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_len"] == 1
    assert by_doc[1][0]["pad_tokens"] == 63
    assert len(by_doc[2]) == 1 and by_doc[2][0]["pad_tokens"] == 0
    assert by_doc[2][0]["last_token"] == "t63"
    assert len(by_doc[3]) == 2
    tail = [r for r in by_doc[3] if r["chunk_idx"] == 1][0]
    assert tail["chunk_len"] == 1 and tail["first_token"] == "u64"


def test_kmv_sketch_matches_python(spark):
    from s2_geometry_rust_spark.operators.sketches import (
        KMV_M, kmv_distinct_per_group)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r["lang"]: r for r in kmv_distinct_per_group(docs, k=64).collect()}
    texts = docs.select("lang", "text").collect()
    grams: dict[str, set[str]] = {}
    for r in texts:
        toks = [t for t in r["text"].split() if t]
        grams.setdefault(r["lang"], set()).update(
            " ".join(toks[i:i + 2]) for i in range(len(toks) - 1)
        )
    for lang, gset in grams.items():
        hs = sorted(_py_kmv_hash(g) for g in gset)
        n = len(hs)
        row = got[lang]
        assert row["n_distinct_exact"] == n
        if n <= 64:
            assert row["kmv_estimate"] == n
        else:
            est = round(63.0 * float(KMV_M) / hs[63])
            assert row["kmv_estimate"] == est
            # sanity: the sketch is a real estimate, not garbage
            assert 0.5 * n < est < 2.0 * n
    assert set(got) == set(grams)


def test_kmv_small_group_exact(spark):
    from s2_geometry_rust_spark.operators.sketches import (
        kmv_distinct_per_group)

    df = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "aa bb dd"), (3, "x")],
        ["doc_id", "text"],
    ).withColumn("lang", F.lit("xx"))
    got = kmv_distinct_per_group(df, k=64).collect()
    # bigrams: {aa bb, bb cc, bb dd}; doc 3 too short for a bigram
    assert len(got) == 1
    assert got[0]["n_distinct_exact"] == 3
    assert got[0]["kmv_estimate"] == 3


def test_wrs_sample_matches_python_with_margins(spark):
    """A-ES selection replayed in python: ranking parity AND the
    adjacent-key-gap margin that makes the libm ln() last-ulp
    difference between engines irrelevant."""
    import math

    from s2_geometry_rust_spark.operators.sampling import (
        weighted_sample_per_group)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("source", "doc_id", "n_chars").collect()
    got = {}
    for r in weighted_sample_per_group(docs, k=10).select(
            "source", "doc_id", "sample_rank").collect():
        got[(r["source"], r["sample_rank"])] = r["doc_id"]

    groups: dict[str, list] = {}
    for r in rows:
        h = _py_kmv_hash(str(r["doc_id"]))
        u = (float(h) + 0.5) / float(1 << 60)
        key = math.log(u) / float(r["n_chars"])
        groups.setdefault(r["source"], []).append((key, r["doc_id"]))
    for src, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rank, (key, doc_id) in enumerate(items[:10], start=1):
            assert got[(src, rank)] == doc_id
        # margin: adjacent keys around the cut differ macroscopically
        gaps = [items[i][0] - items[i + 1][0]
                for i in range(min(11, len(items) - 1))]
        assert min(abs(g) for g in gaps) > 1e-9


def test_wrs_weight_dominance(spark):
    """A row with overwhelming weight is effectively always chosen:
    its key ln(u)/w approaches 0 from below while every unit-weight
    key is < ln(u_max) << 0."""
    from s2_geometry_rust_spark.operators.sampling import (
        weighted_sample_per_group)

    rows = [(i, "g", 1) for i in range(200)] + [(999, "g", 10**9)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = weighted_sample_per_group(df, k=5).select("doc_id").collect()
    assert 999 in {r["doc_id"] for r in got}
