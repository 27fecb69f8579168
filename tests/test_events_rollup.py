"""Multi-granularity rollup (GROUPING SETS continuous aggregate):
pandas ground truth per granularity + the one-scan/one-shuffle claim.
"""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_rollup_matches_pandas(spark):
    from s2_geometry_rust_spark.operators.events import (
        multi_granularity_rollup,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = multi_granularity_rollup(ev).toPandas()
    pdf = ev.select("ts", "event_type", "value").toPandas()
    pdf["cents"] = (
        (pdf["value"] * 100).round(0).astype("int64")
    )
    for gran, freq in (("hour", "h"), ("day", "D"), ("week", "W-MON")):
        if gran == "week":
            # pandas W-MON labels the period END; shift to the Monday
            # the week STARTS on (date_trunc semantics)
            bucket = (
                pdf["ts"].dt.to_period("W-SUN").dt.start_time
            )
        else:
            bucket = pdf["ts"].dt.floor(freq)
        want = (
            pdf.assign(bucket=bucket.dt.strftime("%Y-%m-%d %H:%M:%S"))
            .groupby(["bucket", "event_type"])
            .agg(n=("ts", "size"), sum_cents=("cents", "sum"))
            .reset_index()
            .sort_values(["bucket", "event_type"])
            .reset_index(drop=True)
        )
        sub = (
            got[got.granularity == gran]
            .rename(columns={"bucket_start": "bucket"})
            [["bucket", "event_type", "n", "sum_cents"]]
            .sort_values(["bucket", "event_type"])
            .reset_index(drop=True)
        )
        assert len(sub) == len(want), gran
        assert (sub["bucket"].to_numpy() == want["bucket"].to_numpy()).all(), gran
        assert (sub["n"].to_numpy() == want["n"].to_numpy()).all(), gran
        assert (
            sub["sum_cents"].to_numpy() == want["sum_cents"].to_numpy()
        ).all(), gran


def test_rollup_is_single_scan(spark):
    """The whole point of GROUPING SETS here: ONE parquet scan and ONE
    aggregation exchange feed all three granularities (vs one scan per
    granularity with a union of group-bys)."""
    from s2_geometry_rust_spark.operators.events import (
        multi_granularity_rollup,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = multi_granularity_rollup(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Expand" in plan  # the grouping-sets row expansion node
