"""Tokenized-sequence sources.

The production input is an Iceberg table with columns
(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
(BASELINE.json input_hint). In this sandbox there is no Iceberg catalog
jar, so `read_tokenized` falls through format options: iceberg -> parquet
path. The payload invariant — per-row token-array equality end-to-end — is
enforced by tests and `verify_token_passthrough`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import tokenized_input_schema


def read_tokenized(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the tokenized corpus. Iceberg table name ('db.tbl') or
    parquet path. Filters and column pruning push down either way.
    """
    if "/" not in path_or_table:
        return spark.table(path_or_table)
    try:
        return spark.read.format("iceberg").load(path_or_table)
    except Exception:
        return spark.read.schema(tokenized_input_schema()).parquet(path_or_table)


def lines_to_rows(lines: list[str], source: str) -> list[tuple]:
    """Encode raw log lines as tokenized rows (driver-side, tests/fixtures).

    doc_id = f"{source}:{line_no:08d}" per FIXTURES.md §1.
    """
    rows = []
    for i, line in enumerate(lines):
        toks = list(line.encode("utf-8"))
        rows.append((f"{source}:{i:08d}", toks, len(toks), source))
    return rows


def tokenized_df_from_lines(
    spark: SparkSession, lines: list[str], source: str
) -> DataFrame:
    return spark.createDataFrame(
        lines_to_rows(lines, source), schema=tokenized_input_schema()
    )


def read_cf_log_file(path: str) -> tuple[list[str], list[str]]:
    """Read a CloudFront standard-log text file (driver-side, small files):
    returns (field_order from the #Fields: directive, data lines).
    Mirrors /root/reference/cloudfront_std_log.go:287-303.
    """
    fields: list[str] = []
    lines: list[str] = []
    with open(path) as fh:
        for raw in fh.read().split("\n"):
            if not raw:
                continue
            if raw.startswith("#"):
                if raw.startswith("#Fields:"):
                    fields = raw[len("#Fields:") :].strip().split(" ")
                continue
            lines.append(raw)
    return fields, lines


def verify_token_passthrough(parsed: DataFrame, original: DataFrame) -> int:
    """Join back on doc_id and count rows whose token arrays differ.
    Must be 0 — the payload invariant (BASELINE.json input_hint).
    """
    a = parsed.select("doc_id", F.col("tokens").alias("tokens_out"))
    b = original.select("doc_id", F.col("tokens").alias("tokens_in"))
    return (
        a.join(b, "doc_id")
        .filter(~F.expr("tokens_out == tokens_in"))
        .count()
    )
