"""Gap-based sessionization — the classic log-analytics operator the
reference's per-file aggregation model has no room for, but any 100 TB
event pipeline needs: order each user's events in time, start a new
session whenever the gap to the previous event exceeds the timeout, and
label every event with its session.

Spark-first shape: ONE shuffle (the window partitionBy on the user key),
then lag + a running sum of session-start flags inside that partition —
no self-joins, no iteration, whole-stage codegen throughout. Per-user
event counts are bounded in practice (a user's history fits a partition);
a pathological robot key is exactly what `operators/skew.hot_keys` flags
upstream.

Determinism: timestamps truncate to seconds before the gap comparison and
session numbering is a running count of boolean flags in (ts, tiebreak)
order — reproducible row-for-row by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Label every event with `session_idx` (0-based per user, time order)
    and `is_session_start`. A session starts at the user's first event and
    whenever the gap to the previous event exceeds `gap_seconds`.

    `order_tiebreak` makes same-second events deterministic; pass None if
    the (user, ts) pair is already unique.
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else []
    )
    w = Window.partitionBy(user_col).orderBy(*order)
    ts_sec = F.unix_timestamp(F.date_trunc("second", F.col(ts_col)))
    prev = F.lag(ts_sec).over(w)
    start = prev.isNull() | (ts_sec - prev > F.lit(int(gap_seconds)))
    return (
        events.withColumn("is_session_start", start)
        .withColumn(
            "session_idx",
            F.sum(F.col("is_session_start").cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            - F.lit(1),
        )
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """One row per (user, session): event count and duration in seconds.
    The downstream rollup a funnel/engagement job consumes."""
    sess = sessionize(events, user_col, ts_col, gap_seconds, order_tiebreak)
    ts_sec = F.unix_timestamp(F.date_trunc("second", F.col(ts_col)))
    return (
        sess.groupBy(user_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_sec) - F.min(ts_sec)).alias("duration_sec"),
        )
    )
