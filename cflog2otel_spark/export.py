"""OTLP/HTTP metrics export.

The reference exports over OTLP gRPC (app.go:207-241, otlp.go) — gRPC
bindings aren't available here, but OTLP/HTTP with JSON encoding is an
equally standard collector wire (same proto payload, POST
/v1/metrics, content-type application/json), implemented with the stdlib
only. The payload is the proto-JSON tree golden-verified against the
reference's e2e fixtures (golden.encode_otlp), lower-cased into the
canonical OTLP JSON field names.

Driver-side by design: data points are already aggregated (a few rows per
window x attrs), so export is control-plane work like the reference's.
gzip compression mirrors the reference's `gzip: true` config
(otlp.go / config `otel.gzip`).
"""

from __future__ import annotations

import gzip as _gzip
import json
import urllib.error
import urllib.request
from typing import Any

# encode_otlp uses Go-SDK-style wrapper keys ("Data"/"Sum"/"Value" oneofs)
# to match the reference's goldie fixtures; the wire format flattens them.
_ONEOF_NUM = {"AsInt": "asInt", "AsDouble": "asDouble"}
_ONEOF_ATTR = {
    "StringValue": "stringValue",
    "BoolValue": "boolValue",
    "IntValue": "intValue",
    "DoubleValue": "doubleValue",
}


def _attr_wire(a: dict) -> dict:
    inner = a["value"]["Value"]
    k, v = next(iter(inner.items()))
    return {"key": a["key"], "value": {_ONEOF_ATTR[k]: v}}


def _dp_wire(dp: dict) -> dict:
    out: dict[str, Any] = {}
    for k, v in dp.items():
        if k == "attributes":
            out["attributes"] = [_attr_wire(a) for a in v]
        elif k == "Value":
            kk, vv = next(iter(v.items()))
            out[_ONEOF_NUM[kk]] = vv
        elif k == "start_time_unix_nano":
            out["startTimeUnixNano"] = str(v)
        elif k == "time_unix_nano":
            out["timeUnixNano"] = str(v)
        elif k == "bucket_counts":
            out["bucketCounts"] = [str(x) for x in v]
        elif k == "explicit_bounds":
            out["explicitBounds"] = v
        elif k == "count":
            out["count"] = str(v)
        else:
            out[k] = v
    return out


def to_wire(req: dict) -> dict:
    """golden.encode_otlp request tree -> canonical OTLP/HTTP JSON body
    (ExportMetricsServiceRequest)."""
    rms = []
    for rm in req["resource_metrics"]:
        wire_rm: dict[str, Any] = {
            "resource": {
                "attributes": [
                    _attr_wire(a) for a in rm["resource"]["attributes"]
                ]
            },
            "scopeMetrics": [],
        }
        for sm in rm["scope_metrics"]:
            wire_sm: dict[str, Any] = {"scope": sm.get("scope", {}), "metrics": []}
            if sm.get("schema_url"):
                wire_sm["schemaUrl"] = sm["schema_url"]
            for metric in sm["metrics"]:
                wm: dict[str, Any] = {"name": metric["name"]}
                for k_src, k_dst in (("description", "description"), ("unit", "unit")):
                    if metric.get(k_src):
                        wm[k_dst] = metric[k_src]
                data = metric["Data"]
                if "Sum" in data:
                    d = data["Sum"]
                    wm["sum"] = {
                        "dataPoints": [_dp_wire(dp) for dp in d["data_points"]],
                        "aggregationTemporality": d["aggregation_temporality"],
                        "isMonotonic": d["is_monotonic"],
                    }
                else:
                    d = data["Histogram"]
                    wm["histogram"] = {
                        "dataPoints": [_dp_wire(dp) for dp in d["data_points"]],
                        "aggregationTemporality": d["aggregation_temporality"],
                    }
                wire_sm["metrics"].append(wm)
            wire_rm["scopeMetrics"].append(wire_sm)
        rms.append(wire_rm)
    return {"resourceMetrics": rms}


def export_otlp_http(
    reqs: list[dict],
    endpoint: str,
    gzip: bool = False,
    headers: dict[str, str] | None = None,
    timeout: float = 30.0,
    encoding: str = "json",
) -> int:
    """POST each request to <endpoint>/v1/metrics (endpoint may already
    include the path). Returns the number of successful exports; raises on
    the first HTTP failure like the reference joins exporter errors.

    encoding='json' sends proto-JSON; encoding='protobuf' sends the binary
    ExportMetricsServiceRequest (otlp_proto.encode_export_request,
    Content-Type application/x-protobuf) — the same message bytes the
    reference's gRPC exporter frames (app.go:207-241)."""
    url = endpoint if endpoint.rstrip("/").endswith("/v1/metrics") else (
        endpoint.rstrip("/") + "/v1/metrics"
    )
    n = 0
    for req in reqs:
        if encoding == "protobuf":
            from .otlp_proto import encode_export_request

            body = encode_export_request(to_wire(req))
            hdrs = {"Content-Type": "application/x-protobuf", **(headers or {})}
        else:
            body = json.dumps(to_wire(req)).encode()
            hdrs = {"Content-Type": "application/json", **(headers or {})}
        if gzip:
            body = _gzip.compress(body)
            hdrs["Content-Encoding"] = "gzip"
        r = urllib.request.Request(url, data=body, headers=hdrs, method="POST")
        with urllib.request.urlopen(r, timeout=timeout) as resp:
            if resp.status >= 300:
                raise urllib.error.HTTPError(
                    url, resp.status, "export failed", resp.headers, None
                )
        n += 1
    return n


# ------------------------------------------------------- OTLP gRPC (opt-in) ---
#
# The reference's native transport is OTLP gRPC (app.go:243-258). The
# sandbox has no grpc bindings, so this path is feature-gated like the PIL
# decode: detect at import, raise a clear error when absent, and ship the
# already-byte-correct otlp_proto message over a raw grpc unary call when
# the bindings exist (no generated stubs needed — the serializer is
# identity over our hand-encoded ExportMetricsServiceRequest bytes).

GRPC_AVAILABLE = False
try:  # pragma: no cover - not installed in this container
    import grpc  # noqa: F401

    GRPC_AVAILABLE = True
except ImportError:
    pass

_GRPC_EXPORT_METHOD = (
    "/opentelemetry.proto.collector.metrics.v1.MetricsService/Export"
)


def grpc_channel_target(endpoint: str) -> str:
    """host:port gRPC channel target from a user-supplied endpoint.

    The old `endpoint.replace("http://", "")` stripped the scheme
    substring ANYWHERE in the string and passed path suffixes
    (`host:4317/v1`) through as an invalid grpc target (ADVICE r4).
    Parse properly: gRPC-native target syntax (`dns:///host:4317`,
    `ipv4:...`, `ipv6:...`, `unix:...` — schemes grpc resolves itself)
    passes through UNCHANGED (ADVICE r5: urlsplit on `dns:///h:p` yields
    an empty netloc, so the old fallthrough mangled it to `dns:`); for
    http(s)-style URLs take the netloc; otherwise split off any path
    suffix from the bare authority."""
    from urllib.parse import urlsplit

    scheme = endpoint.split(":", 1)[0].lower() if ":" in endpoint else ""
    if scheme in ("dns", "ipv4", "ipv6", "unix", "unix-abstract", "xds"):
        return endpoint
    if "//" in endpoint:
        parts = urlsplit(endpoint)
        if parts.netloc:
            return parts.netloc
    # bare "host:4317" or "host:4317/v1/metrics"
    return endpoint.split("/", 1)[0]


def export_otlp_grpc(
    reqs: list[dict],
    endpoint: str,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
    insecure: bool = True,
) -> int:
    """Export over OTLP gRPC — the reference's exact wire (app.go:243-258).
    Frames otlp_proto.encode_export_request bytes (the same message the
    HTTP-protobuf path sends, pinned-field-tested) through a generic unary
    call, so no generated protobuf stubs are required. Raises RuntimeError
    when the grpc package is not installed (GRPC_AVAILABLE False)."""
    if not GRPC_AVAILABLE:
        raise RuntimeError(
            "grpc bindings are not installed; use export_otlp_http "
            "(encoding='protobuf' sends the identical message bytes)"
        )
    import grpc

    from .otlp_proto import encode_export_request

    target = grpc_channel_target(endpoint)
    channel = (
        grpc.insecure_channel(target)
        if insecure
        else grpc.secure_channel(target, grpc.ssl_channel_credentials())
    )
    md = list((headers or {}).items())
    n = 0
    try:
        call = channel.unary_unary(
            _GRPC_EXPORT_METHOD,
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        from .otlp_proto import decode_export_response

        for req in reqs:
            resp = call(encode_export_request(to_wire(req)), timeout=timeout,
                        metadata=md or None)
            # a non-empty response carries partial_success — surface it
            # instead of silently dropping rejected data points (ADVICE r4)
            ps = decode_export_response(resp or b"").get("partialSuccess")
            if ps:
                import logging

                logging.getLogger(__name__).warning(
                    "OTLP partial success: rejected_data_points=%s %s",
                    ps.get("rejectedDataPoints", 0),
                    ps.get("errorMessage", ""),
                )
            n += 1
    finally:
        channel.close()
    return n
