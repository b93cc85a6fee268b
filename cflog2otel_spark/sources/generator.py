"""Deterministic synthetic tokenized-corpus generator.

Distributed generation: we build an id range with spark.range (no driver-side
materialization) and synthesize each CloudFront log line with NATIVE column
expressions (concat_ws of per-field expressions seeded by deterministic
hashes of the row id), then tokenize with the vectorized encode UDF. The same
(seed, n_rows) always produces byte-identical corpora, so benches and the
two-parallelism scaling runs see identical input.

Value distributions per FIXTURES.md §2: statuses {200:60%,301/302:10%,
404:15%,502:15%}, time-taken ~log-normal around 0.1s, fixed URI stems, ~5%
'-' nulls on nullable fields, one HOT distribution at ~50% of rows (skew
knob for salting/AQE tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import encode_tokens_col

DISTRIBUTIONS = [
    "EMLHOTDISTRIB",  # the hot one: ~50% of rows
    "EABCD1EXAMPLE",
    "EABCD2EXAMPLE",
    "EABCD3EXAMPLE",
    "EABCD4EXAMPLE",
    "EABCD5EXAMPLE",
]

URI_STEMS = ["/index.html", "/favicon.ico", "/", "/api/v1/items", "/api/v1/users"]
EDGES = ["LAX1", "SEA19-C1", "SEA19-C2", "IAD12", "FRA2"]
METHODS = ["GET", "GET", "GET", "POST", "HEAD"]


def _h(seed: int, salt: int) -> F.Column:
    """Deterministic uniform int64 from the row id (xxhash64 is stable
    across Spark versions and partitionings)."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(salt)))


def generate_lines(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    n_hours: int = 4,
    rows_per_file: int = 10_000,
    start_ts: str = "2024-03-01 00:00:00",
    partitions: int | None = None,
) -> DataFrame:
    """(doc_id, line, source) with deterministic content."""
    df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)

    def pick(seed_salt: int, options: list[str]) -> F.Column:
        c = _h(seed, seed_salt) % len(options)
        expr = F.lit(options[0])
        for i, o in enumerate(options[1:], 1):
            expr = F.when(c == i, F.lit(o)).otherwise(expr)
        return expr

    # hot-distribution skew: half of rows land on DISTRIBUTIONS[0]
    dist_roll = _h(seed, 1) % 100
    dist = F.when(dist_roll < 50, F.lit(DISTRIBUTIONS[0])).otherwise(
        pick(2, DISTRIBUTIONS[1:])
    )

    status_roll = _h(seed, 3) % 100
    status = (
        F.when(status_roll < 60, F.lit(200))
        .when(status_roll < 65, F.lit(301))
        .when(status_roll < 70, F.lit(302))
        .when(status_roll < 85, F.lit(404))
        .otherwise(F.lit(502))
    )

    ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(start_ts).cast("timestamp"))
        + (_h(seed, 4) % (n_hours * 3600))
    )
    date_s = F.date_format(ts, "yyyy-MM-dd")
    time_s = F.date_format(ts, "HH:mm:ss")
    datehour = F.date_format(ts, "yyyy-MM-dd-HH")

    # ~5% '-' nulls on nullable fields
    def nully(col: F.Column, salt: int) -> F.Column:
        return F.when(_h(seed, salt) % 100 < 5, F.lit("-")).otherwise(col)

    time_taken = F.round(
        F.exp((_h(seed, 5) % 1000) / 250.0) / F.lit(22.0), 3
    )  # skewed positive, median ~0.1s
    sc_bytes = (_h(seed, 6) % 50000) + 100
    cs_bytes = (_h(seed, 7) % 2000) + 20

    file_no = (F.col("id") / rows_per_file).cast("bigint")
    source = F.concat(
        F.lit("logs/"), dist, F.lit("."), datehour, F.lit("."),
        F.upper(F.conv(F.abs(F.xxhash64(dist, datehour, file_no)) % 999999937, 10, 36)),
        F.lit(".gz"),
    )

    host = F.concat(F.lower(dist), F.lit(".cloudfront.net"))
    ua = pick(8, [
        "Mozilla/5.0%20(Windows%20NT%2010.0;%20Win64;%20x64)",
        "curl/7.55.1",
        "Mozilla/5.0%20(Macintosh;%20Intel%20Mac%20OS%20X)",
    ])
    result_type = F.when(status >= 500, F.lit("Error")).otherwise(
        pick(9, ["Hit", "Miss", "RefreshHit"])
    )

    line = F.concat_ws(
        "\t",
        date_s,
        time_s,
        pick(10, EDGES),
        sc_bytes.cast("string"),
        F.concat(F.lit("192.0.2."), (_h(seed, 11) % 255).cast("string")),
        pick(12, METHODS),
        host,
        pick(13, URI_STEMS),
        status.cast("string"),
        nully(F.lit("http://www.example.com/"), 14),
        ua,
        F.lit("-"),
        F.lit("-"),
        result_type,
        F.upper(F.conv(_h(seed, 15) % 999999937, 10, 36)),
        nully(host, 16),
        pick(17, ["https", "http"]),
        cs_bytes.cast("string"),
        time_taken.cast("string"),
        F.lit("-"),
        nully(F.lit("TLSv1.2"), 18),
        nully(F.lit("ECDHE-RSA-AES128-GCM-SHA256"), 19),
        result_type,
        pick(20, ["HTTP/2.0", "HTTP/1.1"]),
        F.lit("-"),
        F.lit("-"),
        ((_h(seed, 21) % 64000) + 1024).cast("string"),
        time_taken.cast("string"),
        result_type,
        F.lit("text/html"),
        (_h(seed, 22) % 10000).cast("string"),
        F.lit("-"),
        F.lit("-"),
    )

    return df.select(
        F.concat(source, F.lit(":"), F.lpad(F.col("id").cast("string"), 12, "0")).alias(
            "doc_id"
        ),
        line.alias("line"),
        source.alias("source"),
    )


def generate_tokenized(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    **kw,
) -> DataFrame:
    """Full tokenized corpus per the input hint schema."""
    lines = generate_lines(spark, n_rows, seed=seed, **kw)
    # n_tok from the token array, NOT by re-encoding the line: CollapseProject
    # would otherwise inline the (huge) line expression twice per row
    return lines.select(
        "doc_id",
        encode_tokens_col(F.col("line")).alias("tokens"),
        "source",
    ).select("doc_id", "tokens", F.size("tokens").alias("n_tok"), "source")


def write_corpus(df: DataFrame, path: str, partition_by_source: bool = True) -> None:
    w = df.write.mode("overwrite")
    if partition_by_source:
        # aligns the physical layout with the pipeline's (source, time-bucket)
        # axis so the backfill re-read prunes to one (dist, datehour) slice
        w = w.partitionBy("source")
    w.parquet(path)
