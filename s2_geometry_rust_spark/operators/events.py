"""Event-stream batch operators over the events table.

Engine additions for the training-data pipeline (no s2-geometry-rust
counterpart — the reference has no event/temporal layer): gap-based
sessionization, the batch twin of what a Structured Streaming
session-window (``F.session_window``) computes incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 10-minute inactivity gap, in microseconds (ts has microsecond
# precision; comparing in integer micros keeps the oracle exact).
DEFAULT_GAP_US = 10 * 60 * 1_000_000


def sessionize(events: DataFrame, gap_us: int = DEFAULT_GAP_US,
               user_col: str = "user_id", ts_col: str = "ts",
               tiebreak_col: str = "event_id") -> DataFrame:
    """Assign every event a per-user session index: a new session starts
    when the gap to the previous event reaches ``gap_us`` (>= — the
    half-open-window convention of Spark's native ``F.session_window``,
    so the batch and streaming sessionizers agree exactly, boundary
    included).

    Scale shape: ONE shuffle (hash partition by user), then two window
    passes over each user's sorted events — lag + running sum, both
    whole-stage codegen.  Session counts per user are bounded, so no
    skew beyond the user-activity distribution itself (a hot user is
    still a single partition's worth of rows, not a join blowup).

    Output: events + ``session_idx`` (1-based per user).

    Timestamps are TIMESTAMP_NTZ; the gap test uses interval
    arithmetic on the naive values (never epoch conversion), so the
    result is independent of the session time zone.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # integer MICROSECOND interval: exact for any gap (float seconds
    # repr breaks the parser below 100 us and loses precision > 2^53)
    gap = F.expr(f"INTERVAL {int(gap_us)} MICROSECOND")
    new_s = F.when(
        prev.isNull() | (F.col(ts_col) - prev >= gap),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(events: DataFrame, gap_us: int = DEFAULT_GAP_US) -> DataFrame:
    """Per-session rollup: event count, span bounds (micros), integer
    cent sum (order-independent aggregates only, so the DuckDB oracle
    hash-matches exactly — same protocol as events_hourly)."""
    s = sessionize(events, gap_us=gap_us)
    return (
        s.withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def funnel_counts(events: DataFrame, steps: tuple[str, ...] =
                  ("view", "click", "purchase"),
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel analysis: how many users completed each prefix of
    ``steps`` in strict timestamp order (unbounded window, first-match
    semantics: step k's timestamp is the earliest event of that type
    strictly after step k-1's).

    Scale shape: one filtered aggregate + equi-join per step, all keyed
    by user — each stage is a hash shuffle on the user key, no window
    over raw events and no self-join explosion (the per-step frames
    hold at most one row per user).  Output: (step_idx, step, n_users).
    """
    # each per-step frame is persisted (<= 1 row per user) so the final
    # union of step counts reuses it instead of re-scanning the events
    # table once per downstream branch (O(steps^2) scans otherwise).
    # The result is materialized HERE (it is <= len(steps) rows) so the
    # per-step caches can be released in finally — returning a lazy
    # plan over persisted frames would leak them into the session.
    spark = events.sparkSession
    step_frames = []
    try:
        reached = events.filter(F.col(type_col) == steps[0]).groupBy(
            F.col(user_col).alias("_u")
        ).agg(F.min(ts_col).alias("_t")).persist()
        step_frames.append(reached)
        out_rows = [(1, steps[0], reached)]
        for k, step in enumerate(steps[1:], start=2):
            nxt = (
                events.filter(F.col(type_col) == step)
                .select(F.col(user_col).alias("_u"),
                        F.col(ts_col).alias("_ts"))
                .join(reached, "_u")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("_u")
                .agg(F.min("_ts").alias("_t"))
                .persist()
            )
            step_frames.append(nxt)
            out_rows.append((k, step, nxt))
            reached = nxt
        counts = None
        for k, step, df in out_rows:
            c = df.agg(F.count("*").alias("n_users")).select(
                F.lit(k).alias("step_idx"), F.lit(step).alias("step"),
                "n_users",
            )
            counts = c if counts is None else counts.unionByName(c)
        rows = counts.collect()
    finally:
        for df in step_frames:
            df.unpersist()
    return spark.createDataFrame(
        rows, "step_idx int, step string, n_users bigint"
    )


def retention_counts(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Cohort retention: users grouped by first-activity day, counted by
    how many were active again N days later — (cohort_day, day_offset,
    n_users).

    Scale shape: one aggregate to (user, active_day) pairs (map-side
    combined), one broadcastable first-day frame joined back, one final
    aggregate — all keyed on user/cohort, no window over raw events.
    """
    day = F.date_trunc("day", F.col(ts_col))
    active = (
        events.select(F.col(user_col).alias("_u"), day.alias("_d"))
        .distinct()
    )
    first = active.groupBy("_u").agg(F.min("_d").alias("_d0"))
    return (
        active.join(first, "_u")
        .withColumn("day_offset", F.datediff(F.col("_d"), F.col("_d0")))
        # emit the cohort day as 'yyyy-MM-dd' TEXT, not a timestamp:
        # pins the dtype so engine (ns) and oracle (us) timestamp
        # precisions can't differ under a dtype-strict comparator
        .groupBy(
            F.date_format("_d0", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count("*").alias("n_users"))
    )
