"""Salted aggregation equivalence, raw CF text-file source (multi-header),
and malformed-row accounting."""

import gzip
import os

from pyspark.sql import functions as F

from cflog2otel_spark.sources.tokenized import read_cf_log_file, tokenized_df_from_lines

from .conftest import CF_LOG, CF_LOG2, SOURCE1


def test_salted_aggregate_matches_direct(spark):
    from cflog2otel_spark.operators.skew import hot_keys, salted_aggregate

    # skewed: 80% of rows on key 'hot'
    rows = [("hot" if i % 10 < 8 else f"k{i % 7}", float(i % 100)) for i in range(5000)]
    df = spark.createDataFrame(rows, ["k", "v"])

    direct = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"n": ("count", "v"), "s": ("sum", "v"), "mn": ("min", "v"), "mx": ("max", "v")},
            n_salts=8,
        ).collect()
    }
    assert salted == direct
    assert hot_keys(df, "k", 0.5) == ["hot"]


def test_read_cf_text_multi_header(spark, tmp_path):
    """Two .gz files with DIFFERENT #Fields: headers parse correctly in one
    call (per-file positional binding, cloudfront_std_log.go:287-303)."""
    from cflog2otel_spark.sources.cf_text import read_cf_text, sniff_header

    f1 = str(tmp_path / "a.gz")
    with gzip.open(f1, "wt") as fh:
        fh.write(open(CF_LOG).read())
    # a file with a reduced, reordered header
    f2 = str(tmp_path / "b.gz")
    with gzip.open(f2, "wt") as fh:
        fh.write("#Version: 1.0\n")
        fh.write("#Fields: sc-status date time\n")
        fh.write("404\t2019-12-01\t23:00:01\n")

    assert sniff_header(f1)[0] == "date"
    assert sniff_header(f2) == ["sc-status", "date", "time"]

    parsed = read_cf_text(spark, [f1, f2])
    assert parsed.count() == 7
    by_status = {
        r["sc_status"]: r["cnt"]
        for r in parsed.groupBy("sc_status").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_status == {200: 3, 502: 3, 404: 1}
    # reduced-header file: unmapped fields are null, timestamp still derives
    r404 = parsed.filter(F.col("sc_status") == 404).collect()[0]
    assert r404["x_edge_location"] is None
    assert str(r404["timestamp"]) == "2019-12-01 23:00:01"
    # source column carries the file path for enrichment
    assert parsed.filter(F.col("source").contains("a.gz")).count() == 6


def test_malformed_stats(spark):
    from cflog2otel_spark.operators.parse import decode_and_parse, malformed_stats

    lines = [
        "2019-12-01\t22:42:31\tLAX1\t392",        # clean
        "2019-12-01\t22:42:32\tLAX1\tBADNUM",     # sc_bytes malformed
        "2019-12-01\t99:99:99\tLAX1\t100",        # timestamp malformed
        "2019-12-01\t22:42:33\tLAX1\t-",          # '-' is null, NOT malformed
    ]
    df = tokenized_df_from_lines(spark, lines, SOURCE1)
    parsed = decode_and_parse(df).withColumn(
        "line", F.decode(F.unhex(F.array_join(F.transform("tokens", lambda x: F.lpad(F.hex(x), 2, "0")), "")), "UTF-8")
    )
    stats = malformed_stats(parsed)
    assert stats["sc_bytes"] == 1
    assert stats["timestamp"] == 1
    assert stats["sc_status"] == 0


def test_malformed_stats_counts_out_of_range_tokens(spark):
    """VERDICT r3 #4: in lenient mode a token outside [0, 255] misses the
    hex-table lookup and its byte is silently DROPPED from the decoded line
    (array_join skips NULL elements) — corrupted output with no error.
    malformed_stats must surface those rows without requiring strict mode."""
    from cflog2otel_spark.operators.parse import (
        decode_and_parse,
        decode_tokens_col,
        malformed_stats,
    )

    lines = ["2019-12-01\t22:42:31\tLAX1\t392"]
    good = tokenized_df_from_lines(spark, lines, SOURCE1)
    poisoned = spark.createDataFrame(
        [("bad1", [50, 300, 65], 3, SOURCE1), ("bad2", [-1, 65], 2, SOURCE1)],
        schema=good.schema,
    )
    raw = good.union(poisoned)
    parsed = decode_and_parse(raw).withColumn(
        "line", F.lit(None).cast("string")
    )
    stats = malformed_stats(parsed)
    assert stats["bad_token_rows"] == 2
    # the corruption really is silent: the poisoned rows decode to a
    # SHORTER string (dropped bytes), not to NULL or an error
    short = raw.filter(F.col("doc_id").startswith("bad")).select(
        F.length(decode_tokens_col(F.col("tokens"))).alias("n"), "n_tok"
    ).collect()
    assert all(r["n"] == r["n_tok"] - 1 for r in short)


def test_malformed_stats_without_tokens_column(spark):
    """The counter is payload-gated: a text-sourced frame (no tokens
    column) keeps the original stats surface."""
    from cflog2otel_spark.operators.parse import decode_and_parse, malformed_stats

    lines = ["2019-12-01\t22:42:31\tLAX1\t392"]
    parsed = decode_and_parse(
        tokenized_df_from_lines(spark, lines, SOURCE1), keep_payload=False
    ).withColumn("line", F.lit(None).cast("string"))
    assert "bad_token_rows" not in malformed_stats(parsed)
