"""Distributed source for raw CloudFront standard-log text files (.gz or
plain), the reference's native input (S1/S2/P1 in SURVEY.md §2).

Header handling mirrors ParseCloudFrontLog (cloudfront_std_log.go:279-331):
each file's `#Fields:` directive binds columns positionally and may differ
between files. Strategy:

  1. driver-side header sniff: read only the first ~4 KB of each file
     (gzip streams decompress incrementally — no full download) to get its
     field order; tiny metadata pass, like the reference's header read.
  2. group files by identical header; ONE distributed scan per header
     group (`spark.read.text(paths)`), comment lines filtered, positional
     parse with that group's field order; groups union.

One header for the whole dataset (the overwhelmingly common case) costs a
single scan. Gzip decompression is Spark-native by extension (S2's magic-
byte sniff is unnecessary — extensions are authoritative for CF logs).
"""

from __future__ import annotations

import gzip
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.parse import parse_cf_lines


def sniff_header(path: str, max_bytes: int = 65536) -> list[str]:
    """Field order from a file's #Fields: directive (driver-side, bounded
    read). Empty list if no directive found in the head."""
    opener = gzip.open if path.endswith(".gz") else open
    try:
        with opener(path, "rb") as fh:
            head = fh.read(max_bytes)
    except OSError:
        return []
    for raw in io.BytesIO(head).read().decode("utf-8", "replace").split("\n"):
        if raw.startswith("#Fields:"):
            return raw[len("#Fields:") :].strip().split(" ")
    return []


def read_cf_text(
    spark: SparkSession,
    paths: list[str],
    strict: bool = False,
    default_header: list[str] | None = None,
) -> DataFrame:
    """Parsed log records from raw CF log files, with a `source` column
    (the file path) feeding the same enrichment as the tokenized path."""
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        hdr = tuple(sniff_header(p)) or tuple(default_header or ())
        groups.setdefault(hdr, []).append(p)

    parts: list[DataFrame] = []
    for hdr, files in groups.items():
        raw = (
            spark.read.text(files)
            .withColumn("source", F.input_file_name())
            .filter(~F.col("value").startswith("#"))
            .filter(F.col("value") != "")
            .withColumnRenamed("value", "line")
        )
        parts.append(
            parse_cf_lines(
                raw, "line", field_order=list(hdr) or None, strict=strict
            )
        )
    if not parts:
        raise ValueError("no input files")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
