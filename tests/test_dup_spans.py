"""duplicate_spans (operators/dedup.py): exact duplicated-substring
spans — planted-duplicate semantics, islands merging, cross-doc-only
flagging, and a brute-force pandas twin over the synthetic corpus."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from s2_geometry_rust_spark.operators.dedup import duplicate_spans


@pytest.fixture(scope="module")
def spark():
    from s2_geometry_rust_spark.session import get_spark

    yield get_spark("test-dup-spans", cpus=4)


def brute(rows, window, min_docs):
    """Reference implementation: dict-of-window-text -> doc sets."""
    wins = {}
    per_doc = {}
    for doc_id, text in rows:
        tk = [t for t in text.split() if t]
        per_doc[doc_id] = []
        for i in range(len(tk) - window + 1):
            wt = " ".join(tk[i:i + window])
            wins.setdefault(wt, set()).add(doc_id)
            per_doc[doc_id].append((i, wt))
    out = []
    for doc_id, lst in per_doc.items():
        flagged = sorted(i for i, wt in lst if len(wins[wt]) >= min_docs)
        run = []
        for p in flagged:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.append((doc_id, run[0], run[-1] + window, len(run)))
                run = [p]
        if run:
            out.append((doc_id, run[0], run[-1] + window, len(run)))
    return sorted(out)


def run_spark(spark, rows, window, min_docs):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = duplicate_spans(df, window=window, min_docs=min_docs).collect()
    return sorted((r.doc_id, r.span_start, r.span_end, r.n_windows)
                  for r in got)


def test_planted_duplicates(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, "one two three " + shared + " four five"),
        (2, shared + " unrelated tail words here now"),
        (3, "totally different text with no overlap at all whatsoever"),
    ]
    got = run_spark(spark, rows, 8, 2)
    assert got == brute(rows, 8, 2)
    # doc 3 never appears
    assert not any(d == 3 for d, *_ in got)
    # doc 1's span covers the shared region: tokens 3..13 -> windows 3..5
    d1 = [g for g in got if g[0] == 1]
    assert d1 == [(1, 3, 13, 3)]


def test_intra_doc_repeat_not_flagged(spark):
    rep = "p q r s t u v w"
    rows = [
        (1, rep + " filler " + rep),  # same window twice IN ONE doc
        (2, "nothing shared with the first document at all okay"),
    ]
    assert run_spark(spark, rows, 8, 2) == []


def test_islands_merge_and_min_docs(spark):
    shared = " ".join(f"tok{i}" for i in range(20))
    rows = [(i, f"head{i} " + shared + f" tail{i}") for i in range(1, 5)]
    for min_docs in (2, 3, 4, 5):
        got = run_spark(spark, rows, 8, min_docs)
        assert got == brute(rows, 8, min_docs)
        if min_docs <= 4:
            # one maximal span per doc covering the 20 shared tokens
            assert len(got) == 4
            for doc_id, start, end, n in got:
                assert end - start == 20 and n == 13
        else:
            assert got == []


def test_corpus_brute_force_parity(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    got = run_spark(spark, rows, 8, 2)
    assert got == brute(rows, 8, 2)
    assert len(got) > 0  # fixture actually exercises the operator


def test_window_hash_is_md5_of_joined_tokens():
    """Pin the hash contract the DuckDB oracle replays."""
    s = "a b c"
    assert hashlib.md5(s.encode()).hexdigest() == \
        hashlib.md5(" ".join(["a", "b", "c"]).encode()).hexdigest()
