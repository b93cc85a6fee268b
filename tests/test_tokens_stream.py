"""Streaming vocab frequencies == batch vocab frequencies after drain,
including multi-micro-batch runs and exactly-once checkpoint recovery of
the delta-partition sink."""

from __future__ import annotations

from pyspark.sql import functions as F


def _write_corpus(spark, path: str, n_docs: int, n_files: int) -> None:
    from cflog2otel_spark.operators.tokens import VOCAB_SIZE

    df = spark.range(n_docs, numPartitions=n_files).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"transform(sequence(1, CAST(id % 7 + 1 AS INT)), "
            f"i -> CAST((id * 13 + i) % {VOCAB_SIZE} AS INT))"
        ).alias("tokens"),
        (F.col("id") % 7 + 1).cast("int").alias("n_tok"),
        F.lit("s0").alias("source"),
    )
    df.write.mode("overwrite").parquet(path)


def test_streaming_vocab_matches_batch(spark, tmp_path):
    from cflog2otel_spark.operators.tokens import vocab_frequencies
    from cflog2otel_spark.streaming.tokens_stream import (
        read_vocab_sink,
        run_streaming_vocab,
    )

    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_corpus(spark, corpus, n_docs=500, n_files=6)

    # force multiple micro-batches so the read-side sum actually merges
    q = run_streaming_vocab(spark, corpus, out, ckpt, max_files_per_trigger=2)
    assert q.awaitTermination(120), "streaming vocab timed out (120s)"

    got = {
        r["token"]: r["freq"] for r in read_vocab_sink(spark, out).collect()
    }
    want = {
        r["token"]: r["freq"]
        for r in vocab_frequencies(spark.read.parquet(corpus)).collect()
    }
    assert got == want

    # re-running over the same checkpoint is a no-op (nothing new to read),
    # and the sink still sums to the batch answer — idempotent drain
    q2 = run_streaming_vocab(spark, corpus, out, ckpt, max_files_per_trigger=2)
    assert q2.awaitTermination(120), "second drain timed out"
    got2 = {
        r["token"]: r["freq"] for r in read_vocab_sink(spark, out).collect()
    }
    assert got2 == want
