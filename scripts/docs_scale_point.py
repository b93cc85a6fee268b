"""Document-dedup scale point: MinHash-LSH pairs, SimHash pairs, and
connected-components cluster resolution over a 100k-document synthetic
corpus (~1% planted near-duplicates) — the driver's documents tables hold
500 rows at every sf, so without this the text-dedup scale claim rests on
toy input while the embedding ops have a 200k-vector point.

Corpus: deterministic (seed 42, pyarrow write, no Spark). Docs are 80-280
words drawn from a 5k-word vocabulary; the last 1% are near-copies of
earlier docs with ~5% of words substituted — high word-3-gram Jaccard, the
thing MinHash banding must recall.

Protocol: 1 cold run + 2 warm per op, report cold + min/median of warm
(the bench.py discipline). Run alone on the box. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflog2otel_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("DOCS_SCALE_ROWS", "100000"))
PATH = f"/tmp/cflog_docs_scale_{N_DOCS}"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def log(msg: str) -> None:
    print(f"[docs-scale] {msg}", file=sys.stderr, flush=True)


def ensure_corpus() -> None:
    if os.path.exists(f"{PATH}/_SUCCESS_BENCH"):
        return
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = time.time()
    rng = np.random.default_rng(42)
    vocab = np.array([f"word{i:04d}" for i in range(5000)])
    n_plant = N_DOCS // 100
    texts: list[str] = []
    for i in range(N_DOCS - n_plant):
        n_words = rng.integers(80, 280)
        texts.append(" ".join(vocab[rng.integers(0, 5000, size=n_words)]))
    srcs = rng.integers(0, N_DOCS - n_plant, size=n_plant)
    for s in srcs:
        words = texts[s].split(" ")
        sub = rng.random(len(words)) < 0.05
        words = [
            vocab[rng.integers(0, 5000)] if m else w for w, m in zip(words, sub)
        ]
        texts.append(" ".join(words))
    table = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    os.makedirs(PATH, exist_ok=True)
    pq.write_table(table, f"{PATH}/part-0.parquet")
    with open(f"{PATH}/_SUCCESS_BENCH", "w") as fh:
        fh.write("ok")
    log(f"corpus gen {time.time() - t0:.1f}s ({N_DOCS} docs, {n_plant} planted dups)")


def timed(label: str, fn, runs: int = 3) -> dict:
    from cflog2otel_spark.operators.dedup import release_persisted

    walls: list[float] = []
    n_out = 0
    for i in range(runs):
        t0 = time.time()
        n_out = fn()
        walls.append(round(time.time() - t0, 3))
        release_persisted()
        log(f"{label} run {i + 1}: {walls[-1]}s ({n_out} rows)"
            + (" (cold)" if i == 0 else ""))
    return {
        "cold_sec": walls[0],
        "value": round(statistics.median(walls[1:]), 3) if len(walls) > 1 else walls[0],
        "runs": walls,
        "n_rows_out": n_out,
    }


def main() -> None:
    from cflog2otel_spark.operators.clustering import dedup_keep
    from cflog2otel_spark.operators.dedup import (
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )

    ensure_corpus()
    spark = get_spark(master=f"local[{CPUS}]", app_name="docs_scale")
    docs = spark.read.parquet(PATH)

    out: dict = {"metric": "docs dedup ops @ 100k docs", "rows": N_DOCS,
                 "unit": "sec", "cpus": int(CPUS), "ops": {}}

    out["ops"]["minhash_lsh_pairs"] = timed(
        "minhash_lsh_pairs", lambda: minhash_lsh_pairs(docs).count()
    )
    out["ops"]["simhash_near_dup"] = timed(
        "simhash_near_dup", lambda: simhash_near_dup_pairs(docs).count(), runs=2
    )

    # cluster resolution over the real candidate output (pairs -> CC -> keep)
    def cc() -> int:
        pairs = minhash_lsh_pairs(docs).select("a", "b")
        return dedup_keep(docs, pairs).filter("NOT keep").count()

    out["ops"]["dedup_clusters"] = timed("dedup_clusters", cc, runs=2)

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
