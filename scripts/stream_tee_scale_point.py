"""Scale point for the r7 stateful-drain parse tee: old shape (every
per-metric stateful query decodes+parses the raw token stream itself —
reconstructed via streaming_sinks) vs new shape (run_streaming_pipeline's
parse tee + per-metric columnar consumers), at BENCH_CORPUS_ROWS rows
(default 10M = 5x the sf0.1 bench corpus).

Usage: python scripts/stream_tee_scale_point.py [n_rows]
Prints one JSON line; numbers cited in OPTIMIZATION_r07.md / BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflog2otel_spark.config import Config  # noqa: E402
from cflog2otel_spark.pipeline import sink_dirname  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
CORPUS = f"/tmp/cflog_corpus_scale_{N_ROWS}"

MULTI_CFG = json.load(open(os.path.join(os.path.dirname(__file__), os.pardir,
                                        "configs", "bench_multi.json"))) \
    if os.path.exists(os.path.join(os.path.dirname(__file__), os.pardir,
                                   "configs", "bench_multi.json")) else None
if MULTI_CFG is None:
    # same 4-metric config bench.py uses (Count/Sum/Histogram/filtered switch)
    MULTI_CFG = {
        "resource_attributes": [
            {"key": "service.name", "value": "Amazon CloudFront"},
            {"key": "aws.cloudfront.distribution_id",
             "value": {"expr": "cloudfront.distributionId"}},
        ],
        "scope": {"name": "bench"},
        "metrics": [
            {"name": "requests", "type": "Count",
             "attributes": [{"key": "http.status_code",
                             "value": {"expr": "log.scStatusCategory"}}]},
            {"name": "bytes", "type": "Sum", "unit": "Byte",
             "value": {"expr": "double(log.scBytes)"},
             "attributes": [{"key": "http.status_code",
                             "value": {"expr": "log.scStatusCategory"}}],
             "is_monotonic": True},
            {"name": "request_time", "type": "Histogram", "unit": "ms",
             "value": {"expr": "log.timeTaken * 1000.0"}},
            {"name": "by_origin", "type": "Count",
             "attributes": [{"key": "origin", "value": {"switch": [
                 {"case": {"expr": 'log.csUriStem.startsWith("/api/")'},
                  "value": "app"},
                 {"case": {"expr": 'log.csUriStem == "/favicon.ico"'},
                  "value": "static"},
                 {"default": "S3"}]}}],
             "filter": {"expr": "log.scStatus >= 200"}},
        ],
    }


def _read_steal():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [int(x) for x in parts]
    return (vals[7] if len(vals) > 7 else 0, sum(vals))


def wait_low_steal(max_wait=90.0, threshold=0.02):
    t0 = time.time()
    while time.time() - t0 < max_wait:
        s0, c0 = _read_steal()
        time.sleep(1)
        s1, c1 = _read_steal()
        if (s1 - s0) / max(c1 - c0, 1) < threshold:
            return
        time.sleep(7)


def run_old(spark, cfg):
    """Pre-tee shape: per-metric stateful query over the raw token stream
    (streaming_sinks), update mode + window-partition overwrite — the exact
    r6/early-r7 run_streaming_pipeline body."""
    from cflog2otel_spark.streaming.stream import (
        _window_overwrite_writer, read_tokenized_stream, streaming_sinks)

    o = tempfile.mkdtemp(prefix="tsp_old_o_")
    c = tempfile.mkdtemp(prefix="tsp_old_c_")
    no_data = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(no_data, None)
    spark.conf.set(no_data, "false")
    try:
        stream = read_tokenized_stream(spark, CORPUS)
        sinks = streaming_sinks(spark, cfg, stream, "1 hour")
        qs = []
        for name, df in sinks.items():
            safe = sink_dirname(name)
            qs.append(
                df.writeStream
                .foreachBatch(_window_overwrite_writer(f"{o}/{safe}"))
                .option("checkpointLocation", f"{c}/{safe}")
                .outputMode("update").trigger(availableNow=True).start()
            )
        for q in qs:
            q.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset(no_data)
        else:
            spark.conf.set(no_data, prev)
        shutil.rmtree(o, ignore_errors=True)
        shutil.rmtree(c, ignore_errors=True)


def run_new(spark, cfg):
    from cflog2otel_spark.streaming.stream import run_streaming_pipeline

    o = tempfile.mkdtemp(prefix="tsp_new_o_")
    c = tempfile.mkdtemp(prefix="tsp_new_c_")
    try:
        for q in run_streaming_pipeline(spark, cfg, CORPUS, o, c,
                                        watermark="1 hour",
                                        trigger_once=True):
            q.awaitTermination()
    finally:
        shutil.rmtree(o, ignore_errors=True)
        shutil.rmtree(c, ignore_errors=True)


def main():
    spark = get_spark(master=f"local[{CPUS}]", app_name="tee_scale",
                      shuffle_partitions=CPUS)
    cfg = Config.from_json(MULTI_CFG)
    if not os.path.exists(f"{CORPUS}/_SUCCESS"):
        from cflog2otel_spark.sources.generator import generate_tokenized

        generate_tokenized(spark, N_ROWS, seed=42,
                           partitions=max(CPUS * 2, 8)).write.mode(
            "overwrite").parquet(CORPUS)
    out = {"n_rows": N_ROWS, "cpus": CPUS, "timings": {}, "steal": {}}
    # alternate old/new so slow host drift hits both arms equally;
    # first pair is the JIT warm-up, second pair is the measurement
    for i in range(2):
        for label, fn in (("old", run_old), ("new", run_new)):
            wait_low_steal()
            s0, c0 = _read_steal()
            t0 = time.time()
            fn(spark, cfg)
            dt = round(time.time() - t0, 2)
            s1, c1 = _read_steal()
            out["timings"][f"{label}_{i}"] = dt
            out["steal"][f"{label}_{i}"] = round(
                (s1 - s0) / max(c1 - c0, 1), 3)
            print(f"[scale] {label}_{i}: {dt}s", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
