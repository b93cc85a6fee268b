"""One-shot sf1 (20M-row) flagship measurement: the linearity point beyond
sf0.1 for BENCH.md (VERDICT r2 #8). Prints one JSON line.

Run alone on the box (concurrent JVMs distort timings 2-5x here).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MULTI_CFG  # noqa: E402
from cflog2otel_spark.config import Config  # noqa: E402
from cflog2otel_spark.pipeline import run_pipeline, write_sinks  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402
from cflog2otel_spark.sources.generator import generate_tokenized  # noqa: E402

N = int(os.environ.get("SF1_ROWS", "20000000"))
PATH = f"/tmp/cflog_corpus_sf1.0_{N}"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="sf1_point")
    marker = f"{PATH}/_SUCCESS_BENCH"
    if not os.path.exists(marker):
        if os.path.exists(PATH):
            shutil.rmtree(PATH)
        t0 = time.time()
        generate_tokenized(spark, N, seed=42, partitions=128).write.mode(
            "overwrite"
        ).parquet(PATH)
        with open(marker, "w") as fh:
            fh.write("ok")
        print(f"[sf1] corpus gen {time.time() - t0:.1f}s", file=sys.stderr)

    corpus = spark.read.parquet(PATH)
    cfg = Config.from_json(MULTI_CFG)
    warm = run_pipeline(spark, cfg, corpus.limit(1000), cache="none")
    for df in warm.sinks.values():
        df.write.format("noop").mode("overwrite").save()

    sink_dir = tempfile.mkdtemp(prefix="sf1_sinks_")
    t0 = time.time()
    res = run_pipeline(spark, cfg, corpus, keep_payload=False)
    write_sinks(res, sink_dir)
    dt = time.time() - t0
    res.unpersist()
    shutil.rmtree(sink_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "pipeline_multi_metric @ sf1",
                "rows": N,
                "value": round(dt, 3),
                "unit": "sec",
                "seq_per_sec": round(N / dt, 1),
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
