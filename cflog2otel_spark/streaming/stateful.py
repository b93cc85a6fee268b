"""Custom stateful streaming operator: cross-batch first-seen dedup.

The batch engine dedups with a hash-groupBy (operators/dedup.exact_dedup);
in a stream the same contract — "emit each key once, ever" — needs state
that outlives a micro-batch. applyInPandasWithState is the Spark-native
harness for that: state is partitioned by key (scales horizontally, same
shuffle key as the groupBy), batched through Arrow, and checkpointed with
the query, so a restart resumes with no re-emission.

Scale notes (100 TB / 10^12 keys):
  - state per key is a single marker row (~few bytes); use the RocksDB
    state store (spark.sql.streaming.stateStore.providerClass) so state
    spills off-heap instead of living in executor memory
  - the TTL bounds state growth exactly like the reference's backfill
    tolerance bounds re-reads: a key older than the TTL may re-emit, which
    is the deliberate lateness contract, not a bug
  - digest the dedup key first (md5/xxhash) when keys are long texts —
    state stores the group key, so shuffle + state bytes follow key size
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup(
    stream: DataFrame,
    key_col: str = "doc_id",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the first row ever seen per key (then one `dup_count`
    bookkeeping column counting suppressed duplicates in that first batch).

    ttl_ms: evict a key's marker after this processing-time TTL — later
    arrivals re-emit. None = keep state forever (exact, unbounded)."""
    out_schema = T.StructType(
        stream.schema.fields + [T.StructField("dup_count", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n = 0
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf) > 0:
                first = pdf.iloc[:1].copy()
            n += len(pdf)
        already_seen = state.exists
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if already_seen or first is None:
            return
        first["dup_count"] = n
        yield first

    return (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(dedup, out_schema, state_schema, "append", timeout)
    )
