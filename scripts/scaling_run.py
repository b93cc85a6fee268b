"""Two-parallelism scaling evidence (BASELINE.json north rule): run the
SAME pipeline job over the SAME deterministic corpus at local[N] and
local[4N], report throughput at both + scaling efficiency
thr(4N) / (4 * thr(N)).

Each level runs in its own subprocess (Spark local master is fixed per
JVM). Writes SCALING.json and a markdown table to BENCH.md.

Usage: python scripts/scaling_run.py [--rows 2000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
from cflog2otel_spark.session import get_spark
from cflog2otel_spark.config import Config
from cflog2otel_spark.pipeline import run_pipeline, write_sinks
from bench import MULTI_CFG

cpus = int(os.environ["SCALE_CPUS"])
corpus_path = os.environ["SCALE_CORPUS"]
spark = get_spark(master=f"local[{cpus}]", app_name=f"scale{cpus}",
                  shuffle_partitions=cpus)
corpus = spark.read.parquet(corpus_path)
n = corpus.count()
# The FIRST full-scale run in a fresh JVM is 3-10x slower (C2/codegen +
# heap growth; see BENCH.md "measurement protocol") — run the job once
# untimed at full scale, then time three steady-state runs and take the
# MEDIAN (robust to a host-VM steal spike hitting one run). Both
# parallelism levels get the identical protocol, so the efficiency ratio
# compares steady states, not JIT or neighbor noise.
import statistics
runs = []
for i in range(4):
    t0 = time.time()
    res = run_pipeline(spark, Config.from_json(MULTI_CFG), corpus, keep_payload=False)
    write_sinks(res, f"/tmp/scale_sinks_{cpus}_{i}")
    runs.append(round(time.time() - t0, 3))
    res.unpersist()
    import shutil
    shutil.rmtree(f"/tmp/scale_sinks_{cpus}_{i}", ignore_errors=True)
dt = statistics.median(runs[1:])
print(json.dumps({"cpus": cpus, "rows": n, "sec": round(dt, 3),
                  "runs": runs, "cold_sec": runs[0],
                  "seq_per_sec": round(n / dt, 1)}))
spark.stop()
"""


def run_level(cpus: int, corpus: str) -> dict:
    env = dict(os.environ, REPO=REPO, SCALE_CPUS=str(cpus), SCALE_CORPUS=corpus)
    out = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, capture_output=True, text=True, timeout=3600
    )
    if out.returncode != 0:
        raise RuntimeError(f"local[{cpus}] run failed:\n{out.stderr[-3000:]}")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=2, help="small parallelism level (big = 4n); default 2 — this sandbox delivers ~2.4 effective cores (see BENCH.md)")
    args = ap.parse_args()

    corpus = f"/tmp/cflog_corpus_scaling_{args.rows}"
    if not os.path.exists(f"{corpus}/_SUCCESS"):
        env = dict(
            os.environ,
            REPO=REPO,
            SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
            BENCH_CORPUS_ROWS=str(args.rows),
            BENCH_CORPUS_PATH=corpus,
        )
        gen = (
            "import os,sys; sys.path.insert(0, os.environ['REPO']);"
            "from cflog2otel_spark.session import get_spark;"
            "import bench; spark = get_spark(master='local[32]');"
            "bench.ensure_corpus(spark); spark.stop()"
        )
        r = subprocess.run([sys.executable, "-c", gen], env=env, timeout=3600,
                           capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(f"corpus gen failed:\n{r.stderr[-3000:]}")

    small = run_level(args.n, corpus)
    big = run_level(args.n * 4, corpus)
    eff = big["seq_per_sec"] / (4 * small["seq_per_sec"])
    report = {
        "corpus_rows": small["rows"],
        "n_cpus": args.n,
        "levels": [small, big],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(report, indent=2))
    with open(f"{REPO}/SCALING.json", "w") as fh:
        json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
