"""Parse stage: tokenized sequences -> typed nullable CloudFront log records.

Reference semantics: /root/reference/cloudfront_std_log.go:279-331
  - `#Fields:` header names columns positionally (:287-303)
  - tab tokenization; more values than fields = hard error, fewer = ok
    (:304-307, :312-315)
  - `-` means NULL (:250-277)
  - int/float parse failure fails the file (:257-277)  -> strict mode
  - derived: timestamp (:59-80), sc_status_category (:109-119),
    user-agent URL-unescape (:124-134), constant type (:308-310)

Spark-first design: ONE Arrow-vectorized pandas UDF decodes the int32 token
array back to the UTF-8 line (the only Python step — the JVM has no
array<int> -> binary builtin); everything downstream is native Column
expressions inside whole-stage codegen: split, get, nullif, try_cast,
to_timestamp, url_decode. At 100 TB the decode UDF is an Arrow-batched
streaming pass (no per-row Python), and Catalyst prunes unused field
projections so configs touching 3 columns only pay for 3 casts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CANONICAL_HEADER, CF_FIELDS


@F.pandas_udf(T.StringType())
def decode_tokens_udf(tokens: pd.Series) -> pd.Series:
    """array<int32> of UTF-8 byte values -> string, Arrow-batched.

    Vectorized: one concatenate over the batch, byte-slice per row (C-level
    memoryview slicing + decode; no per-element Python arithmetic).
    """
    arrs = tokens.to_numpy()
    n = len(arrs)
    if n == 0:
        return pd.Series([], dtype=object)
    out: list[str | None] = [None] * n
    lens = np.zeros(n, dtype=np.int64)
    np_arrs = []
    for i, a in enumerate(arrs):
        if a is None:
            continue
        arr = np.asarray(a, dtype=np.int64)
        lens[i] = arr.size
        np_arrs.append(arr)
    if np_arrs:
        flat = np.concatenate(np_arrs).astype(np.uint8).tobytes()
    else:
        flat = b""
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    for i, a in enumerate(arrs):
        if a is None:
            continue
        out[i] = flat[offs[i] : offs[i + 1]].decode("utf-8", "replace")
    return pd.Series(out, dtype=object)


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def encode_tokens_udf(lines: pd.Series) -> pd.Series:
    """string -> array<int32> of UTF-8 byte values (inverse of decode)."""
    return pd.Series(
        [
            None
            if s is None
            else np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.int32)
            for s in lines
        ],
        dtype=object,
    )


def _field_col(parts: Column, idx: int, dtype: str, strict: bool) -> Column:
    # F.get returns NULL out of bounds (fewer values than fields is legal,
    # cloudfront_std_log.go:313-315); `-` decodes to NULL (:250-277).
    raw = F.nullif(F.get(parts, idx), F.lit("-"))
    if dtype == "string":
        return raw
    target = "BIGINT" if dtype == "long" else "DOUBLE"
    if strict:
        # reference fails the whole file on a bad number (:257-277);
        # under ANSI a plain CAST raises, matching that contract.
        return raw.cast(target)
    return raw.try_cast(target)


def parse_cf_lines(
    df: DataFrame,
    line_col: str = "line",
    field_order: list[str] | None = None,
    strict: bool = False,
    drop_line: bool = True,
) -> DataFrame:
    """Project a raw tab-separated CloudFront log line column into the typed
    nullable record plus derived columns.

    `field_order` is the `#Fields:` header (raw names, positional); defaults
    to the canonical 33-field v1.0 header. Unknown names are skipped with the
    same tolerance as the reference (cloudfront_std_log.go:323). Fields not
    present in the file stay NULL.
    """
    field_order = field_order if field_order is not None else CANONICAL_HEADER
    pos: dict[str, int] = {}
    for i, name in enumerate(field_order):
        pos.setdefault(name, i)

    parts = F.split(F.col(line_col), "\t", -1)
    if strict:
        # more values than header fields is a hard error (:305-307); the
        # guard must stay IN the dataflow (a side column would be pruned
        # by Catalyst), so the parts array itself is gated.
        parts = F.when(
            F.size(parts) > F.lit(len(field_order)),
            F.raise_error(
                F.concat(
                    F.lit("log line has more fields than expected: "),
                    F.col(line_col),
                )
            ).cast("array<string>"),
        ).otherwise(parts)
    out = df.withColumn("_parts", parts)

    cols: list[Column] = []
    for f in CF_FIELDS:
        if f.raw in pos:
            c = _field_col(F.col("_parts"), pos[f.raw], f.dtype, strict)
        else:
            spark_t = {"string": "STRING", "long": "BIGINT", "double": "DOUBLE"}[f.dtype]
            c = F.lit(None).cast(spark_t)
        cols.append(c.alias(f.col))

    keep = [c for c in df.columns if c != line_col or not drop_line]
    out = out.select(*keep, *cols)
    return _derive(out, strict=strict)


def _derive(df: DataFrame, strict: bool) -> DataFrame:
    """Derived fields (cloudfront_std_log.go:59-80, :109-119, :124-134, :308-310)."""
    ts_raw = F.concat_ws(" ", F.col("date"), F.col("time"))
    ts = (
        F.to_timestamp(ts_raw, "yyyy-MM-dd HH:mm:ss")
        if strict
        else F.try_to_timestamp(ts_raw, F.lit("yyyy-MM-dd HH:mm:ss"))
    )
    ts = F.when(F.col("date").isNotNull() & F.col("time").isNotNull(), ts)
    # Go url.QueryUnescape == application/x-www-form-urlencoded decode
    # (%XX and '+' -> space); Spark url_decode matches. '-' was already
    # NULLed before unescaping (:126-128).
    ua = F.url_decode(F.col("cs_user_agent")) if strict else F.try_url_decode(F.col("cs_user_agent"))
    cat = F.concat((F.col("sc_status").cast("bigint") / 100).cast("bigint").cast("string"), F.lit("xx"))
    return (
        df.withColumn("type", F.lit("CloudFront Standard Log"))
        .withColumn("timestamp", ts)
        .withColumn("sc_status_category", cat)
        .withColumn("cs_user_agent", ua)
    )


def decode_and_parse(
    df: DataFrame,
    field_order: list[str] | None = None,
    strict: bool = False,
    keep_payload: bool = True,
) -> DataFrame:
    """tokenized input (doc_id, tokens, n_tok, source) -> parsed log records.

    Payload columns pass through untouched — per-row token-array equality is
    the pipeline invariant (BASELINE.json input_hint).
    """
    out = df.withColumn("line", decode_tokens_udf(F.col("tokens")))
    if not keep_payload:
        out = out.drop("tokens", "n_tok")
    return parse_cf_lines(out, "line", field_order, strict=strict)
