"""Cross-batch stateful dedup (applyInPandasWithState): a key seen in an
earlier micro-batch must be suppressed in later ones — state outlives the
batch and is checkpointed with the query (restart emits nothing new)."""

import pandas as pd


def _query(spark, src, out, ckpt):
    from cflog2otel_spark.streaming.stateful import first_seen_dedup

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    return (
        first_seen_dedup(stream, key_col="doc_id")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def test_first_seen_dedup_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # two files -> two micro-batches (maxFilesPerTrigger=1). Batch 1 has an
    # in-batch duplicate of d1; batch 2 re-sends d1 and d2 plus a new d3.
    pd.DataFrame({"doc_id": ["d1", "d1", "d2"], "text": ["a", "a2", "b"]}).to_parquet(
        src / "batch1.parquet"
    )
    pd.DataFrame({"doc_id": ["d1", "d2", "d3"], "text": ["a3", "b2", "c"]}).to_parquet(
        src / "batch2.parquet"
    )
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"

    q = _query(spark, src, out, ckpt)
    assert q.awaitTermination(300), "streaming query timed out (300s)"
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}

    assert set(rows) == {"d1", "d2", "d3"}  # each key exactly once, ever
    assert rows["d1"]["dup_count"] == 2  # in-batch duplicate counted
    assert rows["d3"]["text"] == "c"

    # restart over the same source + checkpoint: state recovered, nothing
    # re-emits, no duplicate output rows appear
    q2 = _query(spark, src, out, ckpt)
    assert q2.awaitTermination(300), "streaming query timed out (300s)"
    assert spark.read.parquet(str(out)).count() == 3
