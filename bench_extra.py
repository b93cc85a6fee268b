"""Round-7 optimization measurement harness (bench.py is FROZEN; this file
holds the extra isolation benchmarks guide §1.4 asks for: noop-sink timing
per operator/stage, streaming progress breakdowns, and plan captures).

Usage:
  python bench_extra.py <target> [<target> ...]
  targets: flagship strict parsed_cache stream stream_stateful corpus
           corpus_stages decode encode small_queries lsh asof all

Prints one JSON line per target with stage timings. Never used by the
driver; numbers cited in OPTIMIZATION_r07.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from cflog2otel_spark.config import Config  # noqa: E402
from cflog2otel_spark.pipeline import run_pipeline, write_sinks  # noqa: E402
from cflog2otel_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
CORPUS_ROWS = int(os.environ.get("BENCH_CORPUS_ROWS", str(int(20_000_000 * SF))))
CORPUS_PATH = os.environ.get(
    "BENCH_CORPUS_PATH", f"/tmp/cflog_corpus_sf{SF}_{CORPUS_ROWS}"
)

# identical to bench.py's MULTI_CFG (kept in sync by hand; used only for
# isolation timing, never for the driver-visible numbers)
MULTI_CFG = {
    "resource_attributes": [
        {"key": "service.name", "value": "Amazon CloudFront"},
        {"key": "aws.cloudfront.distribution_id", "value": {"expr": "cloudfront.distributionId"}},
    ],
    "scope": {"name": "bench"},
    "metrics": [
        {
            "name": "requests",
            "type": "Count",
            "attributes": [{"key": "http.status_code", "value": {"expr": "log.scStatusCategory"}}],
        },
        {
            "name": "bytes",
            "type": "Sum",
            "unit": "Byte",
            "value": {"expr": "double(log.scBytes)"},
            "attributes": [{"key": "http.status_code", "value": {"expr": "log.scStatusCategory"}}],
            "is_monotonic": True,
        },
        {
            "name": "request_time",
            "type": "Histogram",
            "unit": "ms",
            "value": {"expr": "log.timeTaken * 1000.0"},
        },
        {
            "name": "by_origin",
            "type": "Count",
            "attributes": [
                {
                    "key": "origin",
                    "value": {
                        "switch": [
                            {"case": {"expr": 'log.csUriStem.startsWith("/api/")'}, "value": "app"},
                            {"case": {"expr": 'log.csUriStem == "/favicon.ico"'}, "value": "static"},
                            {"default": "S3"},
                        ]
                    },
                },
            ],
            "filter": {"expr": "log.scStatus >= 200"},
        },
    ],
}


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _read_steal():
    with open("/proc/stat") as fh:
        parts = fh.readline().split()[1:]
    vals = [int(x) for x in parts]
    return (vals[7] if len(vals) > 7 else 0, sum(vals))


def wait_for_low_steal(max_wait: float = 60.0, threshold: float = 0.02) -> float:
    t0 = time.time()
    while time.time() - t0 < max_wait:
        s0, c0 = _read_steal()
        time.sleep(1)
        s1, c1 = _read_steal()
        if (s1 - s0) / max(c1 - c0, 1) < threshold:
            break
        time.sleep(7)
    return time.time() - t0


class T:
    """Per-entry timing with the same steal protocol bench.py uses: gate on
    low hypervisor steal before starting, measure steal during the run, and
    flag contaminated entries in the output instead of trusting them."""

    def __init__(self, spark):
        self.spark = spark
        self.out: dict[str, float] = {}
        self.steal: dict[str, float] = {}

    def run(self, name: str, fn):
        wait_for_low_steal()
        self.spark.sparkContext.setJobDescription(name)
        s0, c0 = _read_steal()
        t0 = time.time()
        r = fn()
        self.out[name] = round(time.time() - t0, 3)
        s1, c1 = _read_steal()
        st = (s1 - s0) / max(c1 - c0, 1)
        self.steal[name] = round(st, 3)
        self.spark.sparkContext.setJobDescription(None)
        print(
            f"[extra] {name}: {self.out[name]}s"
            + (f" (STEAL {st:.0%} — untrusted)" if st > 0.02 else ""),
            file=sys.stderr, flush=True,
        )
        return r


def main() -> None:
    targets = sys.argv[1:] or ["all"]
    spark = get_spark(master=f"local[{CPUS}]", app_name="bench_extra",
                      shuffle_partitions=CPUS)
    if os.environ.get("BX_NO_DATA_OFF"):
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    t = T(spark)
    corpus = spark.read.parquet(CORPUS_PATH)
    cfg = Config.from_json(MULTI_CFG)

    def want(x: str) -> bool:
        return "all" in targets or x in targets

    # warm-up (JIT) on a slice
    warm = run_pipeline(spark, cfg, corpus.limit(1000), cache="none")
    for df in warm.sinks.values():
        noop(df)

    if want("flagship"):
        # stage isolation of the flagship: decode+parse only, then full
        for i in range(2):
            t.run(f"flagship_decode_parse_noop_{i}", lambda: noop(
                run_pipeline(spark, cfg, corpus, cache="none",
                             keep_payload=False).parsed))
        def full():
            sink_dir = tempfile.mkdtemp(prefix="bx_sinks_")
            result = run_pipeline(spark, cfg, corpus, keep_payload=False)
            write_sinks(result, sink_dir)
            result.unpersist()
            shutil.rmtree(sink_dir, ignore_errors=True)
        for i in range(2):
            t.run(f"flagship_full_{i}", full)

    if want("stream"):
        from cflog2otel_spark.streaming.stream import (
            run_streaming_pipeline_single_pass,
        )

        def run_sp():
            o = tempfile.mkdtemp(prefix="bx_so_")
            c = tempfile.mkdtemp(prefix="bx_sc_")
            try:
                qs = run_streaming_pipeline_single_pass(
                    spark, cfg, CORPUS_PATH, o, c, trigger_once=True)
                for q in qs:
                    q.awaitTermination()
                for q in qs:
                    for p in (q.recentProgress or [])[-3:]:
                        keep = {k: p.get(k) for k in ("batchId", "numInputRows", "durationMs")}
                        print("[extra] progress:", json.dumps(keep, default=str), file=sys.stderr)
            finally:
                shutil.rmtree(o, ignore_errors=True)
                shutil.rmtree(c, ignore_errors=True)
        for i in range(2):
            t.run(f"stream_single_pass_{i}", run_sp)

    if want("stream_stateful"):
        from cflog2otel_spark.streaming.stream import run_streaming_pipeline

        def run_st():
            o = tempfile.mkdtemp(prefix="bx_to_")
            c = tempfile.mkdtemp(prefix="bx_tc_")
            try:
                qs = run_streaming_pipeline(
                    spark, cfg, CORPUS_PATH, o, c, watermark="1 hour",
                    trigger_once=True)
                for q in qs:
                    q.awaitTermination()
                for q in qs:
                    lp = q.recentProgress
                    for p in (lp or [])[-2:]:
                        keep = {k: p.get(k) for k in ("batchId", "durationMs", "stateOperators")}
                        print("[extra] stateful progress:", json.dumps(keep, default=str), file=sys.stderr)
            finally:
                shutil.rmtree(o, ignore_errors=True)
                shutil.rmtree(c, ignore_errors=True)
        for i in range(2):
            t.run(f"stream_stateful_{i}", run_st)

    if want("corpus") or want("corpus_stages"):
        from cflog2otel_spark.corpus import run_corpus_pipeline, write_corpus

        docs_raw = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
            "text",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(3)) != 0,
                F.concat(F.col("text"), F.lit(" the of and that have")),
            ).otherwise(F.col("text")),
        )
        bench_docs = docs_raw.filter(F.col("doc_id") % 17 == 0)

    if want("corpus"):
        def run_c():
            out_dir = tempfile.mkdtemp(prefix="bx_corpus_")
            res = run_corpus_pipeline(
                spark, docs_raw, bench=bench_docs, pack_budget=2048,
                sample_fractions={}, default_sample_fraction=0.9,
            )
            try:
                write_corpus(res, out_dir)
            finally:
                res.unpersist()
                shutil.rmtree(out_dir, ignore_errors=True)
        for i in range(2):
            t.run(f"corpus_pipeline_{i}", run_c)

    if want("corpus_stages"):
        from cflog2otel_spark.operators.clustering import dedup_keep
        from cflog2otel_spark.operators.dedup import minhash_lsh_pairs
        from cflog2otel_spark.operators.text import gopher_quality
        from cflog2otel_spark.operators.tokens import (
            pack_tokens, sequence_dedup, token_ngram_contamination,
            tokenize_documents,
        )

        t.run("cs_tokenize_noop", lambda: noop(tokenize_documents(docs_raw)))
        t.run("cs_gopher_noop", lambda: noop(gopher_quality(docs_raw)))
        t.run("cs_seqdedup_noop", lambda: noop(
            sequence_dedup(tokenize_documents(docs_raw))))
        t.run("cs_minhash_noop", lambda: noop(minhash_lsh_pairs(docs_raw)))
        pairs = minhash_lsh_pairs(docs_raw).select("a", "b")
        t.run("cs_dedup_keep_noop", lambda: noop(dedup_keep(docs_raw, pairs)))
        t.run("cs_contamination_noop", lambda: noop(token_ngram_contamination(
            tokenize_documents(docs_raw), tokenize_documents(bench_docs), n=13)))
        t.run("cs_pack_noop", lambda: noop(pack_tokens(
            tokenize_documents(docs_raw), budget=2048)))

    if want("parsed_cache"):
        from cflog2otel_spark.plans.driver_queries import (
            _parsed, events_as_tokenized, release_parsed,
        )

        t.run("events_as_tokenized_noop", lambda: noop(
            events_as_tokenized(spark, SF_DIR)))
        release_parsed()
        t.run("parsed_cache_materialize", lambda: _parsed(spark, SF_DIR).count())
        t.run("parsed_cache_reuse_count", lambda: _parsed(spark, SF_DIR).count())
        release_parsed()

    if want("small_queries"):
        from cflog2otel_spark.plans.driver_queries import QUERIES, release_parsed

        for name in ["cf_count_by_status", "cf_histogram", "cf_sum_bytes",
                     "events_sum_cents", "docs_token_stats", "docs_fingerprint",
                     "docs_exact_dedup", "docs_gopher", "docs_contamination",
                     "tok_packing", "tok_seq_dedup", "tok_pack_emit",
                     "tok_logprob", "tok_vocab_topk", "events_attribution",
                     "docs_dedup_clusters"]:
            fn = QUERIES[name][0]
            t.run(f"q_{name}", lambda fn=fn: noop(fn(spark, SF_DIR)))
        release_parsed()

    if want("lsh"):
        from cflog2otel_spark.operators.dedup import (
            minhash_lsh_pairs, release_persisted, simhash_near_dup_pairs,
        )
        from cflog2otel_spark.operators.similarity import (
            embedding_near_dup_pairs,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        for i in range(2):
            t.run(f"docs_minhash_lsh_{i}", lambda: noop(minhash_lsh_pairs(docs)))
            t.run(f"docs_simhash_{i}", lambda: noop(simhash_near_dup_pairs(docs)))
            t.run(f"emb_near_dup_strict_{i}", lambda: noop(
                embedding_near_dup_pairs(emb, threshold=0.95)))
        release_persisted()

    print(json.dumps({"sf": SF, "cpus": CPUS, "timings": t.out,
                      "steal": t.steal}))
    spark.stop()


if __name__ == "__main__":
    main()
