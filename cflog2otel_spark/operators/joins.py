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
`last(right_struct, ignorenulls=True)` carries each right row forward
to every later left row. One shuffle on the key, window state is a
single row, whole-stage codegen throughout. Right rows sort BEFORE left
rows at equal timestamps, giving the conventional inclusive (`l.ts >=
r.ts`) as-of semantics — the same contract as DuckDB's `ASOF JOIN`,
which is the oracle for the registered gate.

The carried value is ONE struct of (right_ts, *right_cols), non-null iff
the row is a right row — not per-column `last(col, ignorenulls=True)`
(ADVICE r5: independent per-column carries stitched a right row holding
a NULL payload value together with an OLDER right row's non-null value
for that column, diverging from true as-of semantics). Right rows whose
`right_ts` is NULL are dropped up front: a null timestamp can never
satisfy `l.ts >= r.ts` (NULL comparisons are false — the DuckDB / SQL
contract), and under the old ascending sort such rows leaked their
payload into every later row. Left rows with NULL `left_ts` likewise
never match (nulled out in the final projection).

Skew (`chunk_span`): `Window.partitionBy(key)` pulls a key's ENTIRE
history through one task — fine for organic key distributions, a
scale-killer when one degenerate key (null/bot user) holds 10^8 events.
Passing `chunk_span` (seconds) switches to a two-level merge, the same
discipline as tokens.pack_sequences' chunk-keyed prefix scan:

  1. bucket every row by a VALUE-derived time chunk,
     `chunk = floor(epoch(ts) / chunk_span)`;
  2. per-(key, chunk) reduce the last right struct (`max_by` /
     `min_by` — map-side combinable, the shuffle carries one row per
     (key, chunk));
  3. a per-key window over that SUBTOTAL table (bounded by
     time-range / chunk_span rows per key, never by event count)
     yields each chunk's carry-in: the last right row of any EARLIER
     chunk (later, for forward);
  4. join the carry-in back on (key, chunk) and run the merge window
     partitioned by (key, chunk) — every window partition is bounded
     by the key's events within one time chunk — coalescing the
     local carry with the chunk's carry-in.

The carry-in join and the merge window share the (key, chunk) hash
partitioning, so the full data still moves through ONE exchange; the
subtotal table is control-plane sized. Results are identical to the
single-level path (property-tested in tests/test_asof_join.py).

Determinism: if several right rows share (key, ts) the carried row would
be ambiguous, so callers must pre-dedupe the right side (e.g. keep
max(id) per (key, ts)); `asof_join` asserts nothing about it but the
registered gate does exactly that reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, TimestampNTZType, TimestampType


def _epoch(c: Column, is_ts: bool) -> Column:
    # TIMESTAMP_NTZ has no direct numeric cast; route through TIMESTAMP
    # (both sides shift by the same session offset, so differences and
    # bucket boundaries are consistent)
    return c.cast("timestamp").cast("double") if is_ts else c.cast("double")


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
    chunk_span: float | None = None,
) -> DataFrame:
    """For every left row: the nearest right row sharing the `on` key —
    `direction="backward"` (default) takes the greatest `right_ts` <=
    `left_ts`, `direction="forward"` the smallest `right_ts` >= `left_ts`
    (both inclusive, the DuckDB `ASOF JOIN >=` / `<=` contracts). Left
    rows with no match keep nulls (left-join semantics); rows with a NULL
    timestamp on either side never match.

    `tolerance` (seconds; timestamps compare on their epoch value, plain
    numerics on their value) nulls out matches farther than the bound —
    the pandas `merge_asof(tolerance=...)` contract — applied as a
    post-window projection, so it costs no extra shuffle.

    `chunk_span` (same units as `tolerance`) bounds every window
    partition to one key's events within a `chunk_span`-wide time bucket
    — set it when a hot key may hold an unbounded share of the data (see
    module docstring). Output is identical either way.

    Returns all left columns plus `<right_ts><suffix>` and each requested
    right column as `<col><suffix>`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if chunk_span is not None and chunk_span <= 0:
        raise ValueError(f"chunk_span must be > 0, got {chunk_span}")
    backward = direction == "backward"
    rcols = [c for c in (right_cols or right.columns) if c not in (on, right_ts)]
    r_struct_type = StructType(
        [StructField("_ts", right.schema[right_ts].dataType)]
        + [StructField(c, right.schema[c].dataType) for c in rcols]
    )
    # the single carried value: non-null iff the row is a right row
    tagged_r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.struct(
            F.col(right_ts).alias("_ts"), *[F.col(c) for c in rcols]
        ).alias("_asof_r"),
        *[F.lit(None).alias(f"_asof_l_{c}") for c in left.columns],
    )
    tagged_l = left.select(
        F.col(on),
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r_struct_type).alias("_asof_r"),
        *[F.col(c).alias(f"_asof_l_{c}") for c in left.columns],
    )
    unioned = tagged_r.unionByName(tagged_l)
    is_ts = isinstance(
        right.schema[right_ts].dataType, (TimestampType, TimestampNTZType)
    )
    # backward: ascending ts, right(0) before left(1) at ties -> last
    # carried right is the greatest ts <= l.ts. forward: DESCENDING ts with
    # the same tie order -> last carried right is the smallest ts >= l.ts.
    ts_order = F.col("_asof_ts") if backward else F.col("_asof_ts").desc()
    if chunk_span is None:
        w = (
            Window.partitionBy(on)
            .orderBy(ts_order, "_asof_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.select(
            "*", F.last("_asof_r", ignorenulls=True).over(w).alias("_asof_c")
        )
    else:
        chunk = F.floor(
            _epoch(F.col("_asof_ts"), is_ts) / F.lit(float(chunk_span))
        ).alias("_asof_chunk")
        unioned = unioned.select("*", chunk)
        # per-(key, chunk) last right struct: max_by/min_by ignore rows
        # whose ordering value is NULL, so conditioning the ordering on
        # the side tag reduces over RIGHT rows only (NULL when no right
        # row in the chunk). map-side combined; one row per (key, chunk).
        order_val = F.when(
            F.col("_asof_side") == 0, _epoch(F.col("_asof_ts"), is_ts)
        )
        pick = F.max_by if backward else F.min_by
        sub = unioned.groupBy(on, "_asof_chunk").agg(
            pick("_asof_r", order_val).alias("_chunk_last")
        )
        chunk_order = (
            F.col("_asof_chunk") if backward else F.col("_asof_chunk").desc()
        )
        w_sub = (
            Window.partitionBy(on)
            .orderBy(chunk_order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = sub.select(
            F.col(on),
            "_asof_chunk",
            F.last("_chunk_last", ignorenulls=True).over(w_sub).alias(
                "_asof_carry"
            ),
        )
        # join + window share the (key, chunk) hash partitioning: the big
        # side exchanges once, the window reuses it
        w = (
            Window.partitionBy(on, "_asof_chunk")
            .orderBy(ts_order, "_asof_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = (
            unioned.join(carry, [on, "_asof_chunk"], "left")
            .select(
                "*",
                F.coalesce(
                    F.last("_asof_r", ignorenulls=True).over(w),
                    F.col("_asof_carry"),
                ).alias("_asof_c"),
            )
            .drop("_asof_chunk", "_asof_carry")
        )
    matched = carried.filter(F.col("_asof_side") == 1)
    # NULL left_ts never matches (SQL comparison semantics); tolerance
    # nulls out matches beyond the bound — both pure projections
    valid = F.col("_asof_ts").isNotNull()
    if tolerance is not None:
        valid = valid & (
            F.abs(
                _epoch(F.col("_asof_ts"), is_ts)
                - _epoch(F.col("_asof_c._ts"), is_ts)
            )
            <= F.lit(float(tolerance))
        )
    matched = matched.withColumn(
        "_asof_c", F.when(valid, F.col("_asof_c"))
    )
    out_left = [F.col(f"_asof_l_{c}").alias(c) for c in left.columns if c != on]
    return matched.select(
        F.col(on),
        *out_left,
        F.col("_asof_c._ts").alias(f"{right_ts}{suffix}"),
        *[F.col(f"_asof_c.{c}").alias(f"{c}{suffix}") for c in rcols],
    )
