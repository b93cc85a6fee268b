"""Composed corpus-pipeline scale point: run_corpus_pipeline (tokenize →
Gopher quality → exact + MinHash near dedup → deterministic sample →
token-budget mix → pack) over a synthetic corpus 40× the sf0.1 bench
input, with a skewed source column (80% of docs in one source — the
shape that breaks naive per-source windows).

Corpus: the docs_scale_point.py generator (seed 42, 1% planted
near-dups) plus a deterministic skewed source assignment. Protocol:
1 cold + 1 warm full-job run (the job internally materializes the
verdict table once; wall time covers funnel + packed-sequence count).
Run alone on the box. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cflog2otel_spark.session import get_spark  # noqa: E402

N_DOCS = int(os.environ.get("CORPUS_SCALE_ROWS", "200000"))
PATH = f"/tmp/cflog_docs_scale_{N_DOCS}"
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def log(msg: str) -> None:
    print(f"[corpus-scale] {msg}", file=sys.stderr, flush=True)


def ensure_corpus() -> None:
    os.environ["DOCS_SCALE_ROWS"] = str(N_DOCS)
    import importlib

    mod = importlib.import_module("docs_scale_point")
    mod.ensure_corpus()


def main() -> int:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    ensure_corpus()
    spark = get_spark(master=f"local[{CPUS}]", app_name="corpus_scale")
    from pyspark.sql import functions as F

    from cflog2otel_spark.corpus import run_corpus_pipeline

    # skewed sources: 80% of docs in 'web', the rest split across 9
    docs = spark.read.parquet(PATH).withColumn(
        "source",
        F.when(F.col("doc_id") % 5 < 4, F.lit("web")).otherwise(
            F.concat(F.lit("src"), (F.col("doc_id") % 9).cast("string"))
        ),
    ).repartition(int(CPUS))

    out = {"n_docs": N_DOCS, "cpus": int(CPUS)}
    walls = []
    for i in range(2):
        t0 = time.time()
        res = run_corpus_pipeline(
            spark, docs, pack_budget=2048,
            default_sample_fraction=0.95,
            token_budgets={"web": 20_000_000},
            # the synthetic vocabulary has no English stopwords; drop the
            # stopword rule (the documented knob for non-English corpora)
            quality_rules=(
                "word_count_ok", "mean_word_ok", "symbol_ok", "alpha_ok",
            ),
        )
        n_seq = res.sequences.count()
        walls.append(round(time.time() - t0, 3))
        out["funnel"] = res.funnel
        out["n_sequences"] = n_seq
        res.unpersist()
        log(f"run {i + 1}: {walls[-1]}s ({n_seq} sequences)"
            + (" (cold)" if i == 0 else ""))
    out["cold_sec"] = walls[0]
    out["warm_sec"] = walls[-1]
    out["docs_per_sec_warm"] = round(N_DOCS / walls[-1], 1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
