"""skip-or-fail on unparseable object keys (app.go:306-313) and typed
switch zero values (cel.go:239-292) — behavioral tests."""

import pytest
from pyspark.sql import functions as F

from cflog2otel_spark.config import Config
from cflog2otel_spark.pipeline import run_pipeline
from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, SOURCE1

BAD_SOURCE = "logs/not-a-cf-key.txt"  # no .gz, no dist.datehour.hash shape


def _corpus(spark):
    _, lines = read_cf_log_file(CF_LOG)
    good = tokenized_df_from_lines(spark, lines, SOURCE1)
    bad = tokenized_df_from_lines(spark, lines, BAD_SOURCE)
    return good.union(bad), len(lines)


def _count_cfg(no_skip: bool = False) -> Config:
    return Config.from_json(
        {
            "no_skip": no_skip,
            "scope": {"name": "t"},
            "metrics": [{"name": "requests", "type": "Count", "interval": "1h"}],
        }
    )


def test_bad_key_file_skipped_when_no_skip_false(spark):
    """NoSkip=false: the whole unparseable-key file contributes nothing
    (the reference skips the file before parsing it)."""
    corpus, n_lines = _corpus(spark)
    result = run_pipeline(spark, _count_cfg(no_skip=False), corpus, cache="none")
    total = result.sinks["requests"].agg(F.sum("value")).first()[0]
    assert total == n_lines  # only SOURCE1's lines


def test_bad_key_errors_when_no_skip_true(spark):
    """NoSkip=true: the run fails at the first unparseable key, in-dataflow
    (no extra scan), with the key in the message."""
    corpus, _ = _corpus(spark)
    result = run_pipeline(spark, _count_cfg(no_skip=True), corpus, cache="none")
    with pytest.raises(Exception, match="failed to parse object key"):
        result.sinks["requests"].collect()


def test_no_skip_true_clean_corpus_passes(spark):
    """The assert must be invisible when every key parses."""
    _, lines = read_cf_log_file(CF_LOG)
    corpus = tokenized_df_from_lines(spark, lines, SOURCE1)
    result = run_pipeline(spark, _count_cfg(no_skip=True), corpus, cache="none")
    total = result.sinks["requests"].agg(F.sum("value")).first()[0]
    assert total == len(lines)


def test_switch_value_zero_keeps_row_at_zero(spark):
    """A default-less switch in `value` (CELCapable[float64]) contributes
    0.0 for non-matching rows — the row still aggregates (count includes
    it, sum adds 0), unlike a NULL which Spark's sum/count(v) would skip."""
    _, lines = read_cf_log_file(CF_LOG)
    corpus = tokenized_df_from_lines(spark, lines, SOURCE1)
    cfg = Config.from_json(
        {
            "scope": {"name": "t"},
            "metrics": [
                {
                    "name": "hist",
                    "type": "Histogram",
                    "interval": "1h",
                    "boundaries": [0.5],
                    "value": {
                        "switch": [
                            # never matches: scStatus < 0 is impossible
                            {"case": {"expr": "log.scStatus < 0"}, "value": 99.0}
                        ]
                    },
                }
            ],
        }
    )
    result = run_pipeline(spark, cfg, corpus, cache="none")
    row = result.sinks["hist"].first()
    assert row["count"] == len(lines)  # every row aggregated at 0.0
    assert row["sum"] == 0.0
    assert row["bucket_counts"][0] == len(lines)  # all in (-inf, 0.5)
