"""sf5 flagship point (VERDICT r4 #6): one more decade of corpus scale.

The linearity series stopped at 20 M rows (sf1); the 100 TB design claim
was an extrapolation from two points. This measures pipeline_multi_metric
over a 100 M-row tokenized corpus (~11 GB parquet) with the exact bench.py
protocol — idle gate, 1 cold run reported separately, median of warm runs —
and additionally reports the (window, attrs) GROUP CARDINALITY per sink, the
quantity the flagship's shuffle actually scales with: it grows with the
time-range and attribute domain, not with row count, which is the claim the
sub-linear wall-clock growth rests on.

Run alone on the box (concurrent JVMs distort timings 2-5x here).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MULTI_CFG, wait_for_idle  # noqa: E402
from cflog2otel_spark.config import Config  # noqa: E402
from cflog2otel_spark.pipeline import run_pipeline, write_sinks  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402
from cflog2otel_spark.sources.generator import generate_tokenized  # noqa: E402

N = int(os.environ.get("SF5_ROWS", "100000000"))
PATH = f"/tmp/cflog_corpus_sf5.0_{N}"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARM_RUNS = int(os.environ.get("SF5_WARM_RUNS", "2"))


def log(msg: str) -> None:
    print(f"[sf5] {msg}", file=sys.stderr, flush=True)


def ensure_corpus(spark) -> None:
    marker = f"{PATH}/_SUCCESS_BENCH"
    if not os.path.exists(marker):
        if os.path.exists(PATH):
            shutil.rmtree(PATH)
        t0 = time.time()
        generate_tokenized(spark, N, seed=42, partitions=256).write.mode(
            "overwrite"
        ).parquet(PATH)
        with open(marker, "w") as fh:
            fh.write("ok")
        log(f"corpus gen {time.time() - t0:.1f}s")


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="sf5_point")
    ensure_corpus(spark)
    corpus = spark.read.parquet(PATH)
    cfg = Config.from_json(MULTI_CFG)
    warm = run_pipeline(spark, cfg, corpus.limit(1000), cache="none")
    for df in warm.sinks.values():
        df.write.format("noop").mode("overwrite").save()

    wait_for_idle(float(os.environ.get("BENCH_IDLE_MAX_WAIT", "300")))
    runs: list[float] = []
    group_counts: dict[str, int] = {}
    for i in range(1 + WARM_RUNS):
        sink_dir = tempfile.mkdtemp(prefix="sf5_sinks_")
        t0 = time.time()
        res = run_pipeline(spark, cfg, corpus, keep_payload=False)
        write_sinks(res, sink_dir)
        runs.append(round(time.time() - t0, 3))
        if i == 0:
            # sink rows ARE the post-aggregation (window, attrs) groups —
            # the flagship shuffle's output cardinality
            from cflog2otel_spark.pipeline import sink_dirname

            for name, df in res.sinks.items():
                p = f"{sink_dir}/{sink_dirname(name)}"
                group_counts[name] = (
                    spark.read.parquet(p).count()
                    if os.path.isdir(p)
                    else df.count()
                )
        res.unpersist()
        shutil.rmtree(sink_dir, ignore_errors=True)
        log(f"flagship run {i + 1}: {runs[-1]}s" + (" (cold)" if i == 0 else ""))
    med = statistics.median(runs[1:])
    print(
        json.dumps(
            {
                "metric": "pipeline_multi_metric @ sf5",
                "rows": N,
                "value": round(med, 3),
                "unit": "sec",
                "cold_sec": runs[0],
                "runs": runs,
                "spread_pct": round(
                    100.0 * (max(runs[1:]) - min(runs[1:])) / med, 1
                ),
                "seq_per_sec": round(N / med, 1),
                "shuffle_groups_per_sink": group_counts,
                "cpus": int(CPUS),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
