"""Enrich stage: context columns derived from the `source` object key, plus
broadcast dimension lookups.

The reference derives `cloudfront.distributionId` from the S3 object key
`{prefix}{distID}.{datehour}.{hash}.gz` (/root/reference/app.go:434-450) and
binds bucket/object context from the S3 event (/root/reference/cel.go:26-46).
Here `source` is a column, so the parse is a native regexp over the column —
per-file constant in practice, so Catalyst folds it cheaply; at 100 TB it
costs one regex per row with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# basename(source) minus .gz, then SplitN(".", 3): distID . datehour . hash
# (app.go:434-450). datehour is free-form in the reference (any middle part).
_BASE = r"([^/]+)\.gz$"


def parse_source_key(df: DataFrame, source_col: str = "source") -> DataFrame:
    base = F.regexp_extract(F.col(source_col), _BASE, 1)
    ok = base != ""
    # SplitN(".", 3): first two dots split, remainder (incl. dots) is hash
    parts = F.split(base, r"\.", 3)
    valid = ok & (F.size(parts) == 3)
    return (
        df.withColumn("distribution_id", F.when(valid, F.get(parts, 0)))
        .withColumn("datehour", F.when(valid, F.get(parts, 1)))
        .withColumn("object_hash", F.when(valid, F.get(parts, 2)))
    )


def with_context(
    df: DataFrame,
    bucket_name: str | None = None,
    bucket_arn: str | None = None,
    bucket_owner_principal_id: str | None = None,
) -> DataFrame:
    """Constant S3-bucket context columns (CEL `bucket.*` namespace).

    Literal columns — Catalyst constant-folds them; zero runtime cost.
    """
    return (
        df.withColumn("bucket_name", F.lit(bucket_name).cast("string"))
        .withColumn("bucket_arn", F.lit(bucket_arn).cast("string"))
        .withColumn(
            "bucket_owner_principal_id", F.lit(bucket_owner_principal_id).cast("string")
        )
    )


def enrich(df: DataFrame, **context) -> DataFrame:
    return with_context(parse_source_key(df), **context)


def broadcast_lookup(
    df: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast-join a small dimension table (e.g. distribution metadata,
    edge-location geo). Explicit F.broadcast so a 1000-executor plan never
    shuffles the fact side for a dimension lookup.
    """
    return df.join(F.broadcast(dim), on=on, how=how)
