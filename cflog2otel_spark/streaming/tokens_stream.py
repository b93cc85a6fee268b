"""Streaming token-corpus statistics: incremental vocab frequencies.

The tokens-axis twin of the single-pass cf streaming path
(streaming/stream.py): a token corpus arriving as files becomes
micro-batches; each batch's per-token partial counts land as a
`_batch_id`-keyed parquet partition (dynamic overwrite — a replayed batch
replaces its own rows, exactly-once on retry), and the reader sums
partials per token. Summing commutes with counting, so the drained-stream
result equals the batch `vocab_frequencies` exactly — asserted by
`tests/test_tokens_stream.py`.

Scale shape: the per-batch plan is the SAME explode → map-side-combined
count as the batch operator (shuffle bounded by vocab size per batch);
state never accumulates in the streaming engine (no watermark, no state
store) because the delta-partition contract moves the merge to read time,
exactly like the cf single-pass sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

TOKEN_CORPUS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def run_streaming_vocab(
    spark: SparkSession,
    input_path: str,
    out_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
    max_files_per_trigger: int = 64,
):
    """Start the incremental vocab-frequency query; returns the handle."""
    from ..operators.tokens import vocab_frequencies

    stream = (
        spark.readStream.schema(TOKEN_CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            vocab_frequencies(batch_df)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    w = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", f"{checkpoint_dir}/vocab"
    )
    w = (
        w.trigger(availableNow=True)
        if trigger_once
        else w.trigger(processingTime="30 seconds")
    )
    return w.start()


def read_vocab_sink(spark: SparkSession, out_path: str) -> DataFrame:
    """Merge the per-batch partials: sum freq per token (the delta
    contract's read side)."""
    return (
        spark.read.parquet(out_path)
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )
