"""E2E OTLP-proto golden parity — mirrors /root/reference/app_test.go:26-68
(e2e) and :70-150 (e2e_backfill): the full invocation path rendered as the
OTLP ExportMetricsServiceRequest JSON the reference's collector snapshots."""

import json

from cflog2otel_spark.config import Config
from cflog2otel_spark.golden import canonicalize_otlp, encode_otlp
from cflog2otel_spark.operators.backfill import backfill_select
from cflog2otel_spark.pipeline import PipelineResult, run_pipeline
from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, CF_LOG2, CONFIGS, FIXTURES, SOURCE1, SOURCE2


def _load(name):
    with open(f"{FIXTURES}/{name}.golden.json") as fh:
        return canonicalize_otlp(json.load(fh))


def test_e2e_otlp_golden(spark, cf_fixture_df):
    cfg = Config.load(f"{CONFIGS}/request_count_by_status_category.json")
    result = run_pipeline(spark, cfg, cf_fixture_df, cache="none")
    reqs = encode_otlp(result, cfg)
    assert len(reqs) == 1
    assert reqs[0] == _load("e2e")


def test_e2e_backfill_otlp_golden(spark):
    from pyspark.sql import functions as F

    from cflog2otel_spark.operators.aggregate import aggregate_metric
    from cflog2otel_spark.operators.enrich import enrich
    from cflog2otel_spark.operators.parse import decode_and_parse

    _, lines1 = read_cf_log_file(CF_LOG)
    _, lines2 = read_cf_log_file(CF_LOG2)
    corpus = tokenized_df_from_lines(spark, lines1, SOURCE1).union(
        tokenized_df_from_lines(spark, lines2, SOURCE2)
    )
    cfg = Config.load(f"{CONFIGS}/backfil_config.json")
    parsed = enrich(decode_and_parse(corpus))
    selected = backfill_select(
        parsed,
        SOURCE1,
        "2019-12-01 22:56:00",
        cfg.backfill.time_tolerance_seconds,
        {
            SOURCE2: "2019-12-01 22:40:00",
            SOURCE1: "2019-12-01 22:52:00",
        },
    )
    sinks = {m.name: aggregate_metric(selected, cfg, m) for m in cfg.metrics}
    result = PipelineResult(parsed=selected, sinks=sinks, metric_index={m.name: i for i, m in enumerate(cfg.metrics)})
    reqs = encode_otlp(result, cfg)
    assert len(reqs) == 1
    assert reqs[0] == _load("e2e_backfill")
