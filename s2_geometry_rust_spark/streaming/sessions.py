"""Streaming sessionization: the incremental twin of
operators/events.session_stats, via Spark's native session window
(``F.session_window`` — gap-based, watermark-bounded state).

Semantics note: the batch operator numbers sessions 1..n per user;
the streaming window identifies a session by its (start, end) span
instead (a stable key under incremental merging — indexes are not,
because a late event can merge two windows).  The exact-match test
compares the session SPANS and aggregates, which are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_GAP = "10 minutes"


def streaming_session_stats(events: DataFrame, gap: str = DEFAULT_GAP,
                            watermark: str = "30 minutes",
                            ts_col: str = "ts") -> DataFrame:
    """Per (user, session-window) rollup over a stream of events.

    State per key is one open window per user, closed (and emitted,
    in append mode) once the watermark passes its gap horizon —
    bounded memory at any input rate.
    """
    cents = F.round(F.col("value") * 100, 0).cast("long")
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("cents", cents)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("start_ts"),
            F.max(ts_col).alias("end_ts"),
            F.sum("cents").alias("sum_cents"),
        )
        .select("user_id", "n_events", "start_ts", "end_ts", "sum_cents")
    )
