"""SparkSession builder with scale-aware defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DRIVER_MEM = os.environ.get("SPARK_DRIVER_MEMORY", "16g")


def _xms_for(mem: str) -> str:
    """-Xms at 3/4 of the -Xmx string (supports Ng/Nm); '' if unparseable."""
    try:
        unit = mem[-1].lower()
        if unit not in ("g", "m"):
            return ""
        n = int(mem[:-1])
        return f"-Xms{max(1, n * 3 // 4)}{unit}"
    except (ValueError, IndexError):
        return ""


def get_spark(
    master: str | None = None,
    app_name: str = "cflog2otel_spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = cpus if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when the planner's size
        # conditions hold, and let AQE rewrite SMJ->SHJ at runtime when
        # every post-shuffle partition is under 128m (guide §3.1): the
        # engine's joins are id/digest equi-joins whose sort adds nothing.
        # Both knobs are size-gated, so a partition that would not fit a
        # hash table still gets sort-merge. Measured: iterative CC
        # (docs_dedup_clusters) 4.6s -> 1.9s warm at sf0.1 (each label-prop
        # round drops two sorts); pack emit 2.4 -> 1.9.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "128m"
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches = fewer JVM<->Python crossings; measured 2.2x
        # on the token-decode UDF path (36.6s vs 79.7s per 2M rows)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.sql.files.maxPartitionBytes", "256m")
        .config("spark.ui.enabled", "false")
        # local mode: the driver heap IS the executor heap — size it so the
        # persisted pruned projection + concurrent sink jobs never spill at
        # bench scale (box has 128 GiB)
        .config("spark.driver.memory", _DRIVER_MEM)
        # preset the heap: growing from the default -Xms under a 32-thread
        # allocation storm dominated the first full-scale run (measured on
        # the flagship: cold 113.5 s -> 67.0 s, warm 13.1 s -> 8.3 s with
        # -Xms14g). 3/4 of -Xmx, never above it.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", _xms_for(_DRIVER_MEM)),
        )
        # stateful streaming (cross-batch dedup, streaming/stateful.py) keeps
        # one marker row per key — at 100 TB that state outgrows the default
        # in-heap HDFSBackedStateStore; RocksDB spills to local disk and
        # bounds executor memory. Overridable per-session via `extra`.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "SPARK_STATESTORE_PROVIDER",
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider",
            ),
        )
        # RocksDB changelog checkpointing: commit uploads the batch's
        # changelog instead of a full snapshot per state partition per
        # micro-batch (snapshots shift to background maintenance). At 100 TB
        # the per-commit upload is O(delta), not O(state); measured locally
        # it cut the 4-metric stateful drain's summed commitTimeMs ~10x
        # (stateOperators progress, BENCH/OPTIMIZATION_r07.md).
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
            ".enabled",
            os.environ.get("SPARK_ROCKSDB_CHANGELOG", "true"),
        )
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
