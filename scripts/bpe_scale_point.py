"""BPE trainer scale point (VERDICT r5 #7): train_bpe at 1 M docs x 10
merge rounds, recording PER-ROUND wall times.

What must hold: round cost stays FLAT across rounds. Each round rewrites
the corpus through bpe_merge_step and eagerly localCheckpoints the
result; without the checkpoint the transform() layers stack and Catalyst
analysis time grows per round (the measured connected-components lineage
failure mode, BENCH.md). A flat per-round series is the evidence the
truncation works at scale; a rising one is the regression signal.

Corpus: 1 M docs x 24-token mean (~24 M tokens) over a SMALL alphabet
(64 ids) so every round finds a high-frequency pair to merge — 10 rounds
never early-stop. Deterministic seed arithmetic, no files.

Prints one JSON line. Run alone on the box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import wait_for_idle, wait_for_low_steal  # noqa: E402
from cflog2otel_spark.operators.tokens import train_bpe  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402

N = int(os.environ.get("BPE_ROWS", "1000000"))
MERGES = int(os.environ.get("BPE_MERGES", "10"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
ALPHABET = 64


def log(msg: str) -> None:
    print(f"[bpe] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    spark = get_spark(master=f"local[{CPUS}]", app_name="bpe_scale")
    tok = (
        spark.range(N, numPartitions=256)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 33 + 8).cast("int").alias("n_tok"),
        )
        .withColumn(
            "tokens",
            F.expr(
                f"transform(sequence(1, n_tok), "
                f"i -> CAST((doc_id * 31 + i * 7) % {ALPHABET} AS INT))"
            ),
        )
        .drop("n_tok")
        .localCheckpoint(eager=True)  # timing measures the rounds, not gen
    )
    n_tokens = tok.agg(F.sum(F.size("tokens"))).collect()[0][0]
    log(f"corpus materialized: {N} docs, {n_tokens} tokens")

    wait_for_idle(60.0)
    wait_for_low_steal(60.0)
    rounds: list[dict] = []

    def on_round(k, pair, new_id, freq, sec):
        rounds.append(
            {"round": k, "pair": list(pair), "new_id": new_id,
             "freq": freq, "sec": round(sec, 2)}
        )
        log(f"round {k}: merge {pair}->{new_id} (freq {freq}) {sec:.1f}s")

    t0 = time.time()
    cur, merges = train_bpe(tok, MERGES, on_round=on_round)
    total = time.time() - t0
    final_tokens = cur.agg(F.sum(F.size("tokens"))).collect()[0][0]

    secs = [r["sec"] for r in rounds]
    print(
        json.dumps(
            {
                "metric": "train_bpe per-round wall time",
                "docs": N,
                "tokens_in": int(n_tokens),
                "tokens_out": int(final_tokens),
                "merges_done": len(merges),
                "total_sec": round(total, 2),
                "rounds": rounds,
                "round_sec_first": secs[0] if secs else None,
                "round_sec_last": secs[-1] if secs else None,
                "last_over_median": (
                    round(secs[-1] / sorted(secs)[len(secs) // 2], 2)
                    if secs else None
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
