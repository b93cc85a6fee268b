"""sf1 linearity points for BENCH.md, measured with the SAME protocol as
bench.py (VERDICT r3 #5: the old single-shot number carried the residual
cold-JVM factor the flagship protocol excludes):

  1. flagship pipeline_multi_metric over a 20M-row tokenized corpus —
     1 cold run reported separately, then median of 3 warm runs + spread.
  2. embedding near-dup at the production threshold (0.95) over a 200k x
     dim-64 corpus with ~1% planted near-dup pairs — the LSH scale claim
     previously rested on the 20k sf0.1 corpus only.

Run alone on the box (concurrent JVMs distort timings 2-5x here).
Prints one JSON line per measurement.
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

from bench import MULTI_CFG  # noqa: E402
from cflog2otel_spark.config import Config  # noqa: E402
from cflog2otel_spark.pipeline import run_pipeline, write_sinks  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402
from cflog2otel_spark.sources.generator import generate_tokenized  # noqa: E402

N = int(os.environ.get("SF1_ROWS", "20000000"))
N_EMB = int(os.environ.get("SF1_EMB_ROWS", "200000"))
EMB_DIM = 64
PATH = f"/tmp/cflog_corpus_sf1.0_{N}"
EMB_PATH = f"/tmp/cflog_emb_sf1.0_{N_EMB}"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARM_RUNS = int(os.environ.get("SF1_WARM_RUNS", "3"))


def log(msg: str) -> None:
    print(f"[sf1] {msg}", file=sys.stderr, flush=True)


def ensure_corpus(spark) -> None:
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
        log(f"corpus gen {time.time() - t0:.1f}s")


def ensure_embeddings() -> None:
    """200k deterministic dim-64 vectors (pyarrow write, no Spark):
    ISOTROPIC gaussian (the LSH worst case — every pair near-orthogonal,
    sign bits independent coin flips) plus ~1% planted >=0.95 near-dup
    partners. A clustered mixture was tried first and rejected: 50 dense
    clusters sitting just below the threshold made the candidate bound 11
    BILLION pairs at the gate banding — a generator artifact, not a
    realistic mostly-unique web corpus. Isotropic + plants measures the
    honest worst case for the n-aware banding."""
    if os.path.exists(f"{EMB_PATH}/_SUCCESS_BENCH"):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    rng = np.random.default_rng(42)
    vecs = rng.normal(size=(N_EMB, EMB_DIM))
    n_plant = N_EMB // 100
    src = rng.integers(0, N_EMB - n_plant, size=n_plant)
    scale = np.where(np.arange(EMB_DIM) % 2 == 0, 1.05, 0.95)
    vecs[N_EMB - n_plant:] = vecs[src] * scale  # cos >= ~0.9988
    ids = np.arange(N_EMB, dtype=np.int64)
    table = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array(
                list(vecs.astype(np.float32)), pa.list_(pa.float32())
            ),
        }
    )
    os.makedirs(EMB_PATH, exist_ok=True)
    pq.write_table(table, f"{EMB_PATH}/part-0.parquet")
    with open(f"{EMB_PATH}/_SUCCESS_BENCH", "w") as fh:
        fh.write("ok")
    log(f"embeddings gen {time.time() - t0:.1f}s")


def flagship_point(spark) -> None:
    ensure_corpus(spark)
    corpus = spark.read.parquet(PATH)
    cfg = Config.from_json(MULTI_CFG)
    warm = run_pipeline(spark, cfg, corpus.limit(1000), cache="none")
    for df in warm.sinks.values():
        df.write.format("noop").mode("overwrite").save()

    runs: list[float] = []
    for i in range(1 + WARM_RUNS):
        sink_dir = tempfile.mkdtemp(prefix="sf1_sinks_")
        t0 = time.time()
        res = run_pipeline(spark, cfg, corpus, keep_payload=False)
        write_sinks(res, sink_dir)
        runs.append(round(time.time() - t0, 3))
        res.unpersist()
        shutil.rmtree(sink_dir, ignore_errors=True)
        log(f"flagship run {i + 1}: {runs[-1]}s" + (" (cold)" if i == 0 else ""))
    med = statistics.median(runs[1:])
    print(
        json.dumps(
            {
                "metric": "pipeline_multi_metric @ sf1",
                "rows": N,
                "value": round(med, 3),
                "unit": "sec",
                "cold_sec": runs[0],
                "runs": runs,
                "spread_pct": round(
                    100.0 * (max(runs[1:]) - min(runs[1:])) / med, 1
                ),
                "seq_per_sec": round(N / med, 1),
                "cpus": int(CPUS),
            }
        ),
        flush=True,
    )


def near_dup_point(spark) -> None:
    from cflog2otel_spark.operators.dedup import release_persisted
    from cflog2otel_spark.operators.similarity import embedding_near_dup_pairs

    ensure_embeddings()
    emb = spark.read.parquet(EMB_PATH)
    runs: list[float] = []
    n_pairs = 0
    for i in range(1 + max(2, WARM_RUNS - 1)):
        t0 = time.time()
        # production profile: n-aware banding (r = log2(n)+2 -> ~20 bits,
        # candidates O(b*n) instead of O(n^2/2^r)) + 99.9% recall target.
        # The ~2000 planted pairs sit at cos ~0.9988 where the per-band
        # collision prob is far higher than at the 0.95 threshold, so
        # n_pairs ~ n_plant is the recall sanity check.
        n_pairs = embedding_near_dup_pairs(
            emb, threshold=0.95, n_rows=N_EMB, miss_prob=1e-3,
            log_stats=(i == 0),
        ).count()
        runs.append(round(time.time() - t0, 3))
        release_persisted()
        log(f"near_dup run {i + 1}: {runs[-1]}s ({n_pairs} pairs)"
            + (" (cold)" if i == 0 else ""))
    med = statistics.median(runs[1:])
    print(
        json.dumps(
            {
                "metric": "emb_near_dup_strict @ sf1",
                "rows": N_EMB,
                "dim": EMB_DIM,
                "value": round(med, 3),
                "unit": "sec",
                "cold_sec": runs[0],
                "runs": runs,
                "n_pairs": n_pairs,
                "vec_per_sec": round(N_EMB / med, 1),
                "cpus": int(CPUS),
            }
        ),
        flush=True,
    )


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="sf1_point")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flagship"):
        flagship_point(spark)
    if which in ("all", "neardup"):
        near_dup_point(spark)
    spark.stop()


if __name__ == "__main__":
    main()
