"""Schemas for the cflog2otel-spark pipeline.

The data model mirrors the reference's CloudFront standard-log record
(/root/reference/cloudfront_std_log.go:17-54, 36 fields incl. derived) and
the driver input hint (tokenized sequences: doc_id, tokens, n_tok, source).

Every CloudFront field is listed once in CF_FIELDS with:
  - the raw log-file field name (the `#Fields:` header token),
  - the CEL variable name on the `log.` namespace (camelCase, per the Go
    struct tags in cloudfront_std_log.go:17-54),
  - our Spark column name (snake_case),
  - the Spark type after casting.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T


@dataclass(frozen=True)
class CFField:
    raw: str  # name in the `#Fields:` header directive
    cel: str  # name in the CEL `log.` namespace
    col: str  # our Spark column name
    dtype: str  # 'string' | 'long' | 'double'


# The 33 physical fields, in the canonical header order of
# /root/reference/testdata/cf_log.txt:2 (CloudFront standard-log v1.0).
CF_FIELDS: list[CFField] = [
    CFField("date", "date", "date", "string"),
    CFField("time", "time", "time", "string"),
    CFField("x-edge-location", "xEdgeLocation", "x_edge_location", "string"),
    CFField("sc-bytes", "scBytes", "sc_bytes", "long"),
    CFField("c-ip", "clientIp", "client_ip", "string"),
    CFField("cs-method", "csMethod", "cs_method", "string"),
    CFField("cs(Host)", "csHost", "cs_host", "string"),
    CFField("cs-uri-stem", "csUriStem", "cs_uri_stem", "string"),
    CFField("sc-status", "scStatus", "sc_status", "long"),
    CFField("cs(Referer)", "csReferer", "cs_referer", "string"),
    CFField("cs(User-Agent)", "csUserAgent", "cs_user_agent", "string"),
    CFField("cs-uri-query", "csUriQuery", "cs_uri_query", "string"),
    CFField("cs(Cookie)", "csCookie", "cs_cookie", "string"),
    CFField("x-edge-result-type", "xEdgeResultType", "x_edge_result_type", "string"),
    CFField("x-edge-request-id", "xEdgeRequestId", "x_edge_request_id", "string"),
    CFField("x-host-header", "xHostHeader", "x_host_header", "string"),
    CFField("cs-protocol", "csProtocol", "cs_protocol", "string"),
    CFField("cs-bytes", "csBytes", "cs_bytes", "long"),
    CFField("time-taken", "timeTaken", "time_taken", "double"),
    CFField("x-forwarded-for", "xForwardedFor", "x_forwarded_for", "string"),
    CFField("ssl-protocol", "sslProtocol", "ssl_protocol", "string"),
    CFField("ssl-cipher", "sslCipher", "ssl_cipher", "string"),
    CFField(
        "x-edge-response-result-type",
        "edgeResponseResultType",
        "x_edge_response_result_type",
        "string",
    ),
    CFField("cs-protocol-version", "csProtocolVersion", "cs_protocol_version", "string"),
    CFField("fle-status", "fleStatus", "fle_status", "string"),
    CFField("fle-encrypted-fields", "fleEncryptedFields", "fle_encrypted_fields", "long"),
    CFField("c-port", "cPort", "c_port", "long"),
    CFField("time-to-first-byte", "timeToFirstByte", "time_to_first_byte", "double"),
    CFField(
        "x-edge-detailed-result-type",
        "xEdgeDetailedResultType",
        "x_edge_detailed_result_type",
        "string",
    ),
    CFField("sc-content-type", "scContentType", "sc_content_type", "string"),
    CFField("sc-content-len", "scContentLen", "sc_content_len", "long"),
    # kept as strings even though numeric-looking (cloudfront_std_log.go:232-247)
    CFField("sc-range-start", "scRangeStart", "sc_range_start", "string"),
    CFField("sc-range-end", "scRangeEnd", "sc_range_end", "string"),
]

CANONICAL_HEADER: list[str] = [f.raw for f in CF_FIELDS]

# Derived fields added by the enrich stage (not in the raw line):
#  - type:            constant "CloudFront Standard Log" (cloudfront_std_log.go:309)
#  - timestamp:       to_timestamp(date || ' ' || time)  (cloudfront_std_log.go:59-80)
#  - sc_status_category: f"{status//100}xx"              (cloudfront_std_log.go:109-119)
DERIVED_FIELDS: list[tuple[str, str, str]] = [
    ("type", "type", "string"),
    ("timestamp", "timestamp", "timestamp"),
    ("scStatusCategory", "sc_status_category", "string"),
]

# CEL `log.` namespace -> Spark column name
CEL_LOG_FIELDS: dict[str, str] = {f.cel: f.col for f in CF_FIELDS}
CEL_LOG_FIELDS.update({cel: col for cel, col, _ in DERIVED_FIELDS})

# Context (non-log) CEL variables -> Spark column name. The reference binds
# these from the S3 event (cel.go:19-68); we derive them from the `source`
# column / job manifest (SURVEY.md S8).
CEL_CONTEXT_FIELDS: dict[str, str] = {
    "cloudfront.distributionId": "distribution_id",
    "bucket.name": "bucket_name",
    "bucket.arn": "bucket_arn",
    "bucket.ownerIdentity.principalId": "bucket_owner_principal_id",
    "object.key": "source",
    "object.size": "object_size",
    "object.eTag": "object_etag",
    "object.versionId": "object_version_id",
    "object.sequencer": "object_sequencer",
}

_SPARK_TYPES = {
    "string": T.StringType(),
    "long": T.LongType(),
    "double": T.DoubleType(),
    "timestamp": T.TimestampType(),
}


def tokenized_input_schema() -> T.StructType:
    """Input table shape per BASELINE.json input_hint."""
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
            T.StructField("n_tok", T.IntegerType(), False),
            T.StructField("source", T.StringType(), False),
        ]
    )


def parsed_log_schema(include_payload: bool = True) -> T.StructType:
    """Typed nullable schema after parse+enrich (SURVEY.md §1.1)."""
    fields = [T.StructField(f.col, _SPARK_TYPES[f.dtype], True) for f in CF_FIELDS]
    fields += [
        T.StructField("type", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("sc_status_category", T.StringType(), True),
        T.StructField("distribution_id", T.StringType(), True),
        T.StructField("datehour", T.StringType(), True),
    ]
    if include_payload:
        fields += [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("tokens", T.ArrayType(T.IntegerType()), False),
            T.StructField("n_tok", T.IntegerType(), False),
            T.StructField("source", T.StringType(), False),
        ]
    return T.StructType(fields)


ATTR_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.StringType(), False),
        ]
    )
)


def sink_schema(kind: str) -> T.StructType:
    """One row per data point per sink (SURVEY.md §1.5 / FIXTURES.md §4)."""
    common = [
        T.StructField("resource_attrs", ATTR_TYPE, False),
        T.StructField("scope_name", T.StringType(), False),
        T.StructField("scope_version", T.StringType(), False),
        T.StructField("scope_schema_url", T.StringType(), False),
        T.StructField("metric_name", T.StringType(), False),
        T.StructField("metric_description", T.StringType(), False),
        T.StructField("metric_unit", T.StringType(), False),
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("attrs", ATTR_TYPE, False),
        T.StructField("temporality", T.StringType(), False),
    ]
    if kind == "Count":
        extra = [
            T.StructField("value", T.LongType(), False),
            T.StructField("is_monotonic", T.BooleanType(), False),
        ]
    elif kind == "Sum":
        extra = [
            T.StructField("value", T.DoubleType(), False),
            T.StructField("is_monotonic", T.BooleanType(), False),
        ]
    elif kind == "Histogram":
        extra = [
            T.StructField("count", T.LongType(), False),
            T.StructField("sum", T.DoubleType(), False),
            T.StructField("min", T.DoubleType(), True),
            T.StructField("max", T.DoubleType(), True),
            T.StructField("bounds", T.ArrayType(T.DoubleType()), False),
            T.StructField("bucket_counts", T.ArrayType(T.LongType()), False),
        ]
    else:  # pragma: no cover
        raise ValueError(f"unknown sink kind {kind!r}")
    return T.StructType(common + extra)
