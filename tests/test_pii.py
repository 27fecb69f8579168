"""PII detection/redaction (operators/pii.py) and canonical-dedup
keep-best (operators/dedup.dedup_keep_best)."""

import pytest
from pyspark.sql import Row, functions as F


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(rows)])


def test_pii_counts_and_total(spark):
    from s2_geometry_rust_spark.operators.pii import with_pii_counts

    rows = [
        "mail me at bob@x.com or a.b-c_d@y.org now",          # 2 emails
        "call 555-123-4567 twice 555-123-4567",               # 2 phones
        "ssn 123-45-6789 ip 10.0.0.1 and 192.168.255.254",    # 1 ssn 2 ip
        "clean text with no pii at all",
        "",
    ]
    got = {
        r["doc_id"]: r
        for r in with_pii_counts(_docs(spark, rows)).collect()
    }
    assert (got[0]["n_email"], got[0]["n_pii"]) == (2, 2)
    assert (got[1]["n_phone"], got[1]["n_pii"]) == (2, 2)
    assert (got[2]["n_ssn"], got[2]["n_ipv4"], got[2]["n_pii"]) == (1, 2, 3)
    assert got[3]["n_pii"] == 0 and got[4]["n_pii"] == 0


def test_pii_patterns_disjoint(spark):
    """Phone never matches an SSN-shaped string and vice versa; IPv4
    never fires inside an email host."""
    from s2_geometry_rust_spark.operators.pii import with_pii_counts

    rows = [
        "123-45-6789",        # ssn only
        "555-123-4567",       # phone only
        "u1@h2.sub3.example.com",  # email only
    ]
    got = with_pii_counts(_docs(spark, rows)).collect()
    by = {r["doc_id"]: r for r in got}
    assert (by[0]["n_ssn"], by[0]["n_phone"]) == (1, 0)
    assert (by[1]["n_phone"], by[1]["n_ssn"]) == (1, 0)
    assert (by[2]["n_email"], by[2]["n_ipv4"]) == (1, 0)


def test_redact_pii_bytes(spark):
    from s2_geometry_rust_spark.operators.pii import redact_pii

    rows = ["mail bob@x.com call 555-123-4567 ssn 123-45-6789 ip 10.0.0.1"]
    got = redact_pii(_docs(spark, rows)).select("redacted").first()[0]
    assert got == "mail <EMAIL> call <PHONE> ssn <SSN> ip <IPV4>"


def test_pii_report_shuffle_free(spark):
    """The whole report is a single Project over the scan — the
    executed plan must contain zero Exchange nodes."""
    from s2_geometry_rust_spark.operators.pii import pii_report

    df = pii_report(_docs(spark, ["a@b.co x", "plain"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["n_email"] == 1 and len(rows[0]["redacted_md5"]) == 32


def test_dedup_keep_best_argmax(spark):
    """Three near-identical docs (one cluster): the keeper is the
    highest-quality member, not the min id; ties break to min doc_id."""
    from s2_geometry_rust_spark.operators.dedup import dedup_keep_best

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the hills beyond the river")
    rows = [
        base + " !!!! #### $$$$ %%%%",       # 0: punct-heavy -> lower quality
        base + " extra",                     # 1: clean, long -> high quality
        base + " extra2",                    # 2: clean too
        "completely different singleton words nothing shared here at all",
    ]
    out = dedup_keep_best(_docs(spark, rows), threshold=0.5,
                          n_bands=32).collect()
    by_cluster = {r["cluster_id"]: r for r in out}
    big = by_cluster[0]
    assert big["cluster_size"] == 3
    assert big["kept_doc_id"] in (1, 2)  # a clean doc beats the punct one
    # and the kept quality is the max over the cluster
    from s2_geometry_rust_spark.operators.text import with_quality_score
    q = {r["doc_id"]: r["quality_score"]
         for r in with_quality_score(_docs(spark, rows)).collect()}
    assert big["kept_quality"] == max(q[0], q[1], q[2])
    assert q[big["kept_doc_id"]] == big["kept_quality"]
    # singleton keeps itself
    assert by_cluster[3]["kept_doc_id"] == 3
    assert by_cluster[3]["cluster_size"] == 1


def test_keep_best_is_algebraic_aggregate(spark):
    """No window over clusters: the plan aggregates, it does not sort
    per cluster (hot boilerplate clusters stay map-side combinable)."""
    from s2_geometry_rust_spark.operators.dedup import dedup_keep_best

    df = dedup_keep_best(_docs(spark, ["a b c", "d e f"]), threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
