"""CLI Structured-Streaming mode: --stream drains the corpus with
availableNow and produces the same data points as the batch CLI."""

import subprocess
import sys

from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, CONFIGS, SOURCE1


def test_cli_stream_matches_batch(spark, tmp_path):
    _, lines = read_cf_log_file(CF_LOG)
    corpus = tokenized_df_from_lines(spark, lines, SOURCE1)
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)

    proc = subprocess.run(
        [
            sys.executable, "main.py",
            "--config", f"{CONFIGS}/request_count_by_status_category.json",
            "--input", corpus_path,
            "--out", str(tmp_path / "out"),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--stream",
            "--master", "local[2]",
        ],
        cwd="/root/repo", capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    def points(df):
        return {
            (r["window_start"], r["attrs"][0]["value"]): r["value"]
            for r in df.collect()
        }

    sink = spark.read.parquet(str(tmp_path / "out" / "http.server.requests"))
    got = points(sink)

    from cflog2otel_spark.config import Config
    from cflog2otel_spark.pipeline import run_pipeline

    cfg = Config.load(f"{CONFIGS}/request_count_by_status_category.json")
    batch = run_pipeline(spark, cfg, corpus, cache="none")
    want = points(batch.sinks["http.server.requests"])

    assert got == want and len(got) > 0
