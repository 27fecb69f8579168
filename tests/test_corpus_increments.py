"""snapshot_diff and lm_bigram_novelty semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from s2_geometry_rust_spark.operators.corpus import snapshot_diff
from s2_geometry_rust_spark.operators.vocab import lm_bigram_novelty


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same text"), (2, "old version"), (3, "going away")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same text"), (2, "new version"), (4, "brand new")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert len(out) == 4
    assert out[1]["status"] == "unchanged"
    assert out[2]["status"] == "changed"
    assert out[3]["status"] == "removed" and out[3]["new_md5"] is None
    assert out[4]["status"] == "added" and out[4]["old_md5"] is None


def test_snapshot_diff_contract_covers_all_statuses(spark, sf_dir):
    from s2_geometry_rust_spark.engine_queries import snapshot_diff_q

    st = {r["status"] for r in snapshot_diff_q(spark, sf_dir).collect()}
    assert st == {"added", "removed", "changed", "unchanged"}


def test_lm_bigram_novelty_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),       # bigrams: "a b", "b c"
            (2, "a b d"),       # bigrams: "a b", "b d"
            (3, "a b a b"),     # "a b" x2, "b a" x1
            (4, "solo"),        # no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_bigram_novelty(docs, min_df=3).collect()}
    # df("a b") = 3 docs, everything else df = 1
    assert out[1]["n_bigrams"] == 2 and out[1]["n_known"] == 1
    assert out[1]["sum_df"] == 3 + 1
    assert out[1]["novelty_rate"] == 0.5
    assert out[2]["n_known"] == 1
    # multiplicity kept: doc 3 has 3 occurrences, 2 of them known
    assert out[3]["n_bigrams"] == 3 and out[3]["n_known"] == 2
    assert out[3]["sum_df"] == 3 + 3 + 1
    assert out[4]["n_bigrams"] == 0
    assert out[4]["novelty_rate"] is None and out[4]["mean_df"] is None


def test_lm_bigram_novelty_case_folds(spark):
    docs = spark.createDataFrame(
        [(1, "Alpha Beta"), (2, "alpha beta")], "doc_id long, text string"
    )
    out = lm_bigram_novelty(docs, min_df=2).collect()
    # case-folded tokenization: both docs share the bigram, df = 2
    assert all(r["n_known"] == 1 for r in out)
