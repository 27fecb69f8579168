"""As-of join (union + carry-forward) and bucketed interval range join:
independent pandas ground truth + boundary/tie/replication edge cases.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_matches_pandas_merge_asof(spark):
    from s2_geometry_rust_spark.operators.events import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    errors = ev.filter(F.col("event_type") == "error")
    got = (
        asof_join(clicks, errors, right_payload=("event_id", "value"))
        .select("event_id", "asof_event_id", "asof_value")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cp = clicks.select("event_id", "user_id", "ts").toPandas()
    ep = errors.select("event_id", "user_id", "ts", "value").toPandas()
    want = pd.merge_asof(
        cp.sort_values("ts"),
        ep.sort_values("ts").rename(
            columns={"event_id": "asof_event_id", "value": "asof_value"}
        ),
        on="ts",
        by="user_id",
        direction="backward",  # inclusive <=, same as the operator
    ).dropna(subset=["asof_event_id"])
    want = (
        want[["event_id", "asof_event_id", "asof_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (
        got["asof_event_id"].to_numpy()
        == want["asof_event_id"].to_numpy(int)
    ).all()


def test_asof_equal_ts_is_inclusive(spark):
    from s2_geometry_rust_spark.operators.events import asof_join

    t0 = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        pd.DataFrame({"user_id": [1, 1], "ts": [t0, t0 - dt.timedelta(seconds=1)],
                      "event_id": [10, 11]})
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    right = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [t0], "event_id": [99],
                      "value": [1.5]})
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    got = (
        asof_join(left, right, right_payload=("event_id", "value"))
        .select("event_id", "asof_event_id")
        .toPandas()
    )
    # the equal-ts left row matches (inclusive); the earlier one doesn't
    assert got.to_dict("records") == [
        {"event_id": 10, "asof_event_id": 99}
    ]


def test_asof_empty_right_yields_empty(spark):
    from s2_geometry_rust_spark.operators.events import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    none = ev.filter(F.lit(False))
    assert (
        asof_join(clicks, none, right_payload=("event_id", "value")).count()
        == 0
    )


def _brute_range(events: pd.DataFrame, iv: pd.DataFrame):
    out = []
    for _, e in iv.iterrows():
        m = events[
            (events.user_id == e.user_id)
            & (events.ts >= e.start_ts)
            & (events.ts < e.end_ts)
        ]
        for _, c in m.iterrows():
            out.append((int(e.window_event_id), int(c.event_id)))
    return sorted(out)


def test_range_join_matches_bruteforce_multiple_bucket_widths(spark):
    from s2_geometry_rust_spark.operators.events import range_join_buckets

    ev = spark.read.parquet(f"{SF}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    windows = (
        ev.filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("event_id").alias("window_event_id"),
            F.col("ts").alias("start_ts"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
        )
    )
    want = _brute_range(
        clicks.select("event_id", "user_id", "ts").toPandas(),
        windows.toPandas(),
    )
    # default (max interval length), narrower (forces >2 replicas per
    # interval), and wider buckets must all agree exactly
    for bucket_us in (None, 3600 * 1_000_000, 24 * 3600 * 1_000_000):
        got = sorted(
            (int(r["window_event_id"]), int(r["event_id"]))
            for r in range_join_buckets(
                clicks, windows, bucket_us=bucket_us
            )
            .select("window_event_id", "event_id")
            .toPandas()
            .to_dict("records")
        )
        assert got == want, f"bucket_us={bucket_us}"


def test_range_join_boundaries_exact(spark):
    """start inclusive, end exclusive, at exact microsecond boundaries —
    including an event precisely on a bucket edge."""
    from s2_geometry_rust_spark.operators.events import range_join_buckets

    t0 = _ts("2024-03-01T00:00:00")
    one_us = dt.timedelta(microseconds=1)
    hour = dt.timedelta(hours=1)
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1],
                "event_id": [1, 2, 3, 4],
                "ts": [t0, t0 + hour - one_us, t0 + hour, t0 - one_us],
            }
        )
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1],
                "window_event_id": [100],
                "start_ts": [t0],
                "end_ts": [t0 + hour],
            }
        )
    ).withColumn("start_ts", F.col("start_ts").cast("timestamp_ntz")) \
     .withColumn("end_ts", F.col("end_ts").cast("timestamp_ntz"))
    got = sorted(
        int(r["event_id"])
        for r in range_join_buckets(events, iv)
        .select("event_id")
        .toPandas()
        .to_dict("records")
    )
    assert got == [1, 2]  # start in, end-1us in, end out, start-1us out
