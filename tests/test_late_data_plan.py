"""Late-data idempotent re-emit across checkpointed streaming restarts,
window-anchor property test (hypothesis vs Go-Truncate oracle), and a
physical-plan regression guard for the flagship pipeline."""

from datetime import datetime, timedelta, timezone

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cflog2otel_spark.config import Config
from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, CONFIGS, SOURCE1, SOURCE2


def test_streaming_late_data_updates_window_idempotently(spark, tmp_path):
    """A late file adding rows to an ALREADY-EMITTED window must replace
    that window's delta, not duplicate it (T4: dynamic window-partition
    overwrite + checkpointed resume)."""
    from cflog2otel_spark.streaming.stream import run_streaming_pipeline

    inp, out, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    _, lines = read_cf_log_file(CF_LOG)

    # batch 1: only the three 22:42 (2xx) lines
    tokenized_df_from_lines(spark, lines[:3], SOURCE1).write.mode("overwrite").parquet(inp)
    cfg = Config.load(f"{CONFIGS}/request_count_by_status_category.json")
    for q in run_streaming_pipeline(spark, cfg, inp, out, ck):
        assert q.awaitTermination(120), "streaming query timed out (120s)"
    sink = f"{out}/http.server.requests"
    first = {
        (str(r["window_start"]), r["attrs"][0]["value"]): r["value"]
        for r in spark.read.parquet(sink).collect()
    }
    assert first == {("2019-12-01 22:42:00", "2xx"): 3}

    # batch 2 (restart, same checkpoint): a LATE file with rows in the same
    # 22:42 window plus the 22:51 lines
    tokenized_df_from_lines(spark, lines, SOURCE2).write.mode("append").parquet(inp)
    for q in run_streaming_pipeline(spark, cfg, inp, out, ck):
        assert q.awaitTermination(120), "streaming query timed out (120s)"
    second = {
        (str(r["window_start"]), r["attrs"][0]["value"]): r["value"]
        for r in spark.read.parquet(sink).collect()
    }
    # streaming state accumulated: 3 (old) + 3 (late) in 22:42; window
    # partition overwritten once, never duplicated
    assert second == {
        ("2019-12-01 22:42:00", "2xx"): 6,
        ("2019-12-01 22:51:00", "5xx"): 3,
    }


GO_EPOCH = datetime(1, 1, 1, tzinfo=timezone.utc)


@settings(max_examples=30, deadline=None)
@given(
    epoch_s=st.integers(min_value=0, max_value=2_000_000_000),
    interval=st.sampled_from([1, 7, 45, 60, 90, 300, 420, 3600, 5400, 86400]),
)
def test_window_anchor_property(spark, epoch_s, interval):
    """For arbitrary timestamps and intervals, F.window with our offset
    equals Go time.Truncate (hypothesis-driven; SURVEY.md A4)."""
    from cflog2otel_spark.operators.aggregate import window_col

    ts = datetime.fromtimestamp(epoch_s, tz=timezone.utc).replace(tzinfo=None)
    df = spark.createDataFrame([(ts,)], ["ts"])
    w = df.select(window_col(F.col("ts"), interval).alias("w")).collect()[0]["w"]
    t_utc = ts.replace(tzinfo=timezone.utc)
    delta = (t_utc - GO_EPOCH).total_seconds()
    expect = GO_EPOCH + timedelta(seconds=(delta // interval) * interval)
    assert w["start"].replace(tzinfo=timezone.utc) == expect


def test_flagship_plan_has_no_python_and_prunes_scan(spark, cf_fixture_df, tmp_path):
    """Regression guard for the perf-critical plan shape: no Python eval
    nodes, parquet scan reads only (tokens, source)."""
    from cflog2otel_spark.pipeline import run_pipeline

    path = str(tmp_path / "corpus")
    cf_fixture_df.write.parquet(path)
    corpus = spark.read.parquet(path)
    cfg = Config.load(f"{CONFIGS}/multi_metrics.json")
    res = run_pipeline(spark, cfg, corpus, keep_payload=False, cache="none")
    plan = res.sinks["http.server.requests"]._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
    assert "HashAggregate" in plan
    # scan pruned to the two needed columns
    read_schema = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert read_schema and "tokens" in read_schema[0] and "doc_id" not in read_schema[0]
