"""Tokens-axis scale point: sequence packing + vocab stats over a skewed
10 M-document token corpus.

The graft's payload operators (operators/tokens.py) are oracle-gated at
sf0.01 (500 docs); this measures them at 10 M docs (~200 M tokens) with the
skew shape they were designed for: one HOT source holding 80% of all
documents. `pack_sequences` must not funnel the hot source through one
task — its value-derived chunk scan keys the full-data window by
(source, chunk), so hot-source rows spread over doc-id chunks. The run
verifies the packing invariants at full scale (driver-side aggregate
checks, no collect of data rows):

  - per source: max(tok_offset + n_tok) == sum(n_tok)  (stream is gapless)
  - per source: count(distinct tok_offset) == count(*)  (offsets unique)
  - global: sum(n_tok) == expected corpus token count

and prints one JSON line with wall times + per-source row counts.

Corpus is generated deterministically in-Spark (seed arithmetic on doc_id,
no files, no randomness API) — tokens are (doc_id * 31 + i) % VOCAB_SIZE,
n_tok cycles 8..40.

Run alone on the box (concurrent JVMs distort timings here).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import wait_for_idle  # noqa: E402
from cflog2otel_spark.operators.tokens import (  # noqa: E402
    VOCAB_SIZE,
    pack_sequences,
    vocab_frequencies,
)
from cflog2otel_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("TOK_ROWS", "10000000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WARM_RUNS = int(os.environ.get("TOK_WARM_RUNS", "2"))
BUDGET = 2048


def log(msg: str) -> None:
    print(f"[tok] {msg}", file=sys.stderr, flush=True)


def corpus(spark):
    """(doc_id, tokens, n_tok, source): 80% of docs in the hot source,
    the rest split over 4 cold sources; n_tok cycles 8..40 (mean 24)."""
    return (
        spark.range(N, numPartitions=256)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 33 + 8).cast("int").alias("n_tok"),
            F.when(F.col("id") % 10 < 8, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 4).cast("string")))
            .alias("source"),
        )
        .withColumn(
            "tokens",
            F.expr(
                f"transform(sequence(1, n_tok), "
                f"i -> CAST((doc_id * 31 + i) % {VOCAB_SIZE} AS INT))"
            ),
        )
    )


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="tok_scale")
    tok = corpus(spark)
    cycle = sum(i + 8 for i in range(33))  # n_tok = (doc_id % 33) + 8
    expected_tokens = cycle * (N // 33) + sum(i + 8 for i in range(N % 33))

    # warm-up slice (JIT), then idle-gate, then timed runs
    pack_sequences(tok.limit(1000), budget=BUDGET).write.format("noop").mode(
        "overwrite"
    ).save()
    wait_for_idle(float(os.environ.get("BENCH_IDLE_MAX_WAIT", "300")))

    pack_runs: list[float] = []
    for i in range(1 + WARM_RUNS):
        t0 = time.time()
        pack_sequences(tok, budget=BUDGET).write.format("noop").mode(
            "overwrite"
        ).save()
        pack_runs.append(round(time.time() - t0, 3))
        log(f"pack run {i + 1}: {pack_runs[-1]}s" + (" (cold)" if i == 0 else ""))

    vocab_runs: list[float] = []
    for i in range(1 + WARM_RUNS):
        t0 = time.time()
        vocab_frequencies(tok).write.format("noop").mode("overwrite").save()
        vocab_runs.append(round(time.time() - t0, 3))
        log(f"vocab run {i + 1}: {vocab_runs[-1]}s" + (" (cold)" if i == 0 else ""))

    # full materialization: the token-payload shuffle (every token moves
    # once, keyed by (source, seq_id)) — the op a training loader consumes
    from cflog2otel_spark.operators.tokens import pack_tokens

    emit_runs: list[float] = []
    n_seqs = 0
    for i in range(1 + WARM_RUNS):
        t0 = time.time()
        packed = pack_tokens(tok, budget=BUDGET)
        if i == 0:
            n_seqs = packed.count()
        else:
            packed.write.format("noop").mode("overwrite").save()
        emit_runs.append(round(time.time() - t0, 3))
        log(f"pack_emit run {i + 1}: {emit_runs[-1]}s"
            + (" (cold)" if i == 0 else ""))

    # exact sequence dedup at 10 M rows (digest-only shuffle) and token-
    # 13-gram decontamination (benchmark = every 1000th doc, broadcast)
    from cflog2otel_spark.operators.tokens import (
        sequence_dedup,
        token_ngram_contamination,
    )

    t0 = time.time()
    n_kept = sequence_dedup(tok).filter("keep").count()
    dedup_sec = round(time.time() - t0, 3)
    log(f"seq_dedup {dedup_sec}s ({n_kept} kept)")

    t0 = time.time()
    bench_docs = tok.filter(F.col("doc_id") % 1000 == 0)
    n_cont = (
        token_ngram_contamination(tok, bench_docs, n=13)
        .filter("contaminated")
        .count()
    )
    cont_sec = round(time.time() - t0, 3)
    log(f"contamination {cont_sec}s ({n_cont} flagged)")

    # full-scale invariant verification (aggregate-only, no row collect)
    t0 = time.time()
    packed = pack_sequences(tok, budget=BUDGET)
    per_src = (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tok").alias("tok_sum"),
            F.max(F.col("tok_offset") + F.col("n_tok")).alias("stream_end"),
            F.countDistinct("tok_offset").alias("distinct_offsets"),
        )
        .collect()
    )
    src_rows = {}
    total_tokens = 0
    for r in per_src:
        assert r["stream_end"] == r["tok_sum"], (
            f"gapped stream in {r['source']}: end {r['stream_end']} != "
            f"sum {r['tok_sum']}"
        )
        assert r["distinct_offsets"] == r["rows"], (
            f"duplicate offsets in {r['source']}"
        )
        src_rows[r["source"]] = r["rows"]
        total_tokens += r["tok_sum"]
    assert total_tokens == expected_tokens, (
        f"token count {total_tokens} != expected {expected_tokens}"
    )
    expected_seqs = sum(-(-r["tok_sum"] // BUDGET) for r in per_src)
    assert n_seqs == expected_seqs, (
        f"sequence count {n_seqs} != ceil-sum {expected_seqs}"
    )
    verify_sec = round(time.time() - t0, 3)
    log(f"invariants verified in {verify_sec}s")

    pm, vm = statistics.median(pack_runs[1:]), statistics.median(vocab_runs[1:])
    print(
        json.dumps(
            {
                "metric": "token ops @ 10M skewed docs",
                "rows": N,
                "tokens": total_tokens,
                "pack_sec": pm,
                "pack_runs": pack_runs,
                "pack_docs_per_sec": round(N / pm, 1),
                "vocab_sec": vm,
                "vocab_runs": vocab_runs,
                "pack_emit_sec": statistics.median(emit_runs[1:]),
                "pack_emit_runs": emit_runs,
                "pack_emit_tok_per_sec": round(
                    total_tokens / statistics.median(emit_runs[1:]), 1
                ),
                "n_sequences": n_seqs,
                "seq_dedup_sec": dedup_sec,
                "seq_dedup_kept": n_kept,
                "contamination_sec": cont_sec,
                "contaminated_docs": n_cont,
                "verify_sec": verify_sec,
                "rows_per_source": src_rows,
                "cpus": int(CPUS),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
