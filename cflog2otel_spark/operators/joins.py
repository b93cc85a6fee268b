"""As-of (backward) join — the time-series join Spark's DataFrame API has
no native operator for, re-expressed as a union-merge window so it stays
one shuffle with no range explosion.

A log/attribution pipeline constantly needs "for each left event, the
most recent right event at or before it, per key" (last-touch
attribution, config-as-of-event enrichment, rate lookups). The naive
formulations both fail at scale: an inequality join (`l.ts >= r.ts`)
plans as BroadcastNestedLoopJoin/CartesianProduct, and a per-key
aggregate-then-rejoin does two shuffles plus a skewed reduce.

The merge shape here is the standard streaming-merge trick: tag both
sides, union them (cheap — union is a no-shuffle plan node), then one
window partitioned by the key and ordered by (ts, side-tag) in which
`last(right_payload, ignorenulls=True)` carries each right row forward
to every later left row. One shuffle on the key, window state is a
single row, whole-stage codegen throughout. Right rows sort BEFORE left
rows at equal timestamps, giving the conventional inclusive (`l.ts >=
r.ts`) as-of semantics — the same contract as DuckDB's `ASOF JOIN`,
which is the oracle for the registered gate.

Determinism: if several right rows share (key, ts) the carried row would
be ambiguous, so callers must pre-dedupe the right side (e.g. keep
max(id) per (key, ts)); `asof_join` asserts nothing about it but the
registered gate does exactly that reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For every left row: the nearest right row sharing the `on` key —
    `direction="backward"` (default) takes the greatest `right_ts` <=
    `left_ts`, `direction="forward"` the smallest `right_ts` >= `left_ts`
    (both inclusive, the DuckDB `ASOF JOIN >=` / `<=` contracts). Left
    rows with no match keep nulls (left-join semantics).

    `tolerance` (seconds; timestamps compare on their epoch value, plain
    numerics on their value) nulls out matches farther than the bound —
    the pandas `merge_asof(tolerance=...)` contract — applied as a
    post-window projection, so it costs no extra shuffle.

    Returns all left columns plus `<right_ts><suffix>` and each requested
    right column as `<col><suffix>`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    rcols = [c for c in (right_cols or right.columns) if c not in (on, right_ts)]
    tagged_r = right.select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        *[F.lit(None).alias(f"_asof_l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias(f"{right_ts}{suffix}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in rcols
        ],
        *[F.col(c).alias(f"_asof_l_{c}") for c in left.columns],
    )
    # backward: ascending ts, right(0) before left(1) at ties -> last
    # carried right is the greatest ts <= l.ts. forward: DESCENDING ts with
    # the same tie order -> last carried right is the smallest ts >= l.ts.
    ts_order = (
        F.col("_asof_ts") if direction == "backward" else F.col("_asof_ts").desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, "_asof_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_r.unionByName(tagged_l).select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True)
            .over(w)
            .alias(f"_asof_c_{c}")
            for c in [right_ts, *rcols]
        ],
    )
    out_left = [
        F.col(f"_asof_l_{c}").alias(c) for c in left.columns if c != on
    ]
    matched = carried.filter(F.col("_asof_side") == 1)
    if tolerance is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        is_ts = isinstance(
            right.schema[right_ts].dataType, (TimestampType, TimestampNTZType)
        )

        def _epoch(c):
            # TIMESTAMP_NTZ has no direct numeric cast; route through
            # TIMESTAMP (both sides shift by the same session offset, so
            # the difference is invariant)
            return (
                c.cast("timestamp").cast("double") if is_ts else c.cast("double")
            )

        within = (
            F.abs(_epoch(F.col("_asof_ts")) - _epoch(F.col(f"_asof_c_{right_ts}")))
            <= F.lit(float(tolerance))
        )
        matched = matched.select(
            *[c for c in matched.columns if not c.startswith("_asof_c_")],
            *[
                F.when(within, F.col(f"_asof_c_{c}"))
                .otherwise(F.lit(None))
                .alias(f"_asof_c_{c}")
                for c in [right_ts, *rcols]
            ],
        )
    return matched.select(
        F.col(on),
        *out_left,
        *[F.col(f"_asof_c_{c}").alias(f"{c}{suffix}") for c in [right_ts, *rcols]],
    )
