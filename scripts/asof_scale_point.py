"""As-of join hot-key scale point (VERDICT r5 #4 done-criterion).

Shape under attack: last-touch attribution where ONE key (a bot / null
user bucket) holds 80% of 10 M left events. The bare
`Window.partitionBy(key)` path drags that key's entire history through a
single task; `chunk_span` switches to the two-level merge (per-(key,
time-chunk) subtotals + a carry-in window over the subtotal table) that
bounds every window partition by a key's events within ONE time chunk.

This run:
  1. verifies chunked == unchunked on a value-hash aggregate at 1 M rows
     (the property tests prove equality exhaustively at small scale; this
     re-proves it on the exact skewed generator used for timing);
  2. times both paths at N rows (default 10 M left / 1 M right) —
     the unchunked number IS the single-task bottleneck, the chunked
     number is the fix;
  3. reports the theoretical max window-partition size of each path
     (hot-key row count vs hot-key rows per chunk) — the "no single-task
     stage" evidence, derived from the same aggregates both engines run.

Event time spans 30 days; chunk_span=3600 s -> 720 chunks, so the hot
key's 8 M rows split into ~11 k-row window partitions.

Prints one JSON line. Run alone on the box (concurrent JVMs distort
timings here).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import wait_for_idle, wait_for_low_steal  # noqa: E402
from cflog2otel_spark.operators.joins import asof_join  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402

N_LEFT = int(os.environ.get("ASOF_LEFT_ROWS", "10000000"))
N_RIGHT = int(os.environ.get("ASOF_RIGHT_ROWS", "1000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
SPAN_SEC = 30 * 24 * 3600  # event time spread
CHUNK_SPAN = 3600.0


def log(msg: str) -> None:
    print(f"[asof] {msg}", file=sys.stderr, flush=True)


def events(spark, n: int, salt: int):
    """(user_id, ts, ev_id): 80% of rows on the single hot key; ts is a
    deterministic non-monotonic spread over SPAN_SEC seconds."""
    return spark.range(n, numPartitions=256).select(
        F.when(F.col("id") % 10 < 8, F.lit("hot"))
        .otherwise(F.concat(F.lit("u"), (F.col("id") % 9973).cast("string")))
        .alias("user_id"),
        ((F.col("id") * 2654435761 + salt) % SPAN_SEC).cast("double").alias("ts"),
        F.col("id").alias("ev_id"),
    )


def run(left, right, chunk_span):
    out = asof_join(
        left, right, on="user_id", right_cols=["ev_id"],
        chunk_span=chunk_span,
    )
    # one aggregate consuming every output column: rows out, matches,
    # and an order-independent value hash over the join's full result
    return out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.count("ev_id_right").alias("matched"),
        F.expr(
            "bit_xor(xxhash64(user_id, ts, ev_id, ts_right, ev_id_right))"
        ).alias("vhash"),
    ).collect()[0]


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="asof_scale")
    result: dict = {
        "metric": "asof_join hot-key scale point",
        "n_left": N_LEFT,
        "n_right": N_RIGHT,
        "hot_share": 0.8,
        "chunk_span_sec": CHUNK_SPAN,
    }

    # --- equality at 1 M on the SAME skewed generator ---
    l1, r1 = events(spark, 1_000_000, 7), events(spark, 100_000, 13)
    a = run(l1, r1, None)
    b = run(l1, r1, CHUNK_SPAN)
    assert tuple(a) == tuple(b), (tuple(a), tuple(b))
    result["equality_1m"] = {
        "rows": a["rows"], "matched": a["matched"], "vhash": str(a["vhash"]),
    }
    log(f"1M equality OK: {a['matched']}/{a['rows']} matched, hash agrees")

    # --- window-partition bound evidence ---
    left, right = events(spark, N_LEFT, 7), events(spark, N_RIGHT, 13)
    sizes = (
        left.select("user_id", "ts")
        .unionByName(right.select("user_id", "ts"))
        .groupBy("user_id", F.floor(F.col("ts") / CHUNK_SPAN).alias("chunk"))
        .count()
        .agg(
            F.max("count").alias("max_per_key_chunk"),
            F.sum("count").alias("rows"),
        )
        .collect()[0]
    )
    hot_rows = int(N_LEFT * 0.8 + N_RIGHT * 0.8)
    result["max_window_partition"] = {
        "bare_key_path": hot_rows,
        "chunked_path": int(sizes["max_per_key_chunk"]),
    }
    log(
        f"window bound: bare={hot_rows} rows in ONE task, "
        f"chunked={sizes['max_per_key_chunk']} max per (key, chunk)"
    )

    # --- timings (warm once per path, then min of 2 gated runs) ---
    for label, span in (("bare", None), ("chunked", CHUNK_SPAN)):
        wait_for_idle(60.0)
        wait_for_low_steal(60.0)
        runs = []
        for i in range(3):
            t0 = time.time()
            row = run(left, right, span)
            dt = time.time() - t0
            runs.append(round(dt, 2))
            log(f"{label} run {i}: {dt:.1f}s ({row['matched']} matched)")
        result[f"{label}_sec"] = min(runs[1:])  # exclude cold run 1
        result[f"{label}_runs"] = runs
        result[f"{label}_matched"] = row["matched"]

    result["speedup"] = round(result["bare_sec"] / result["chunked_sec"], 2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
