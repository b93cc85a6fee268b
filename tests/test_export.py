"""OTLP/HTTP export: the golden-verified proto-JSON tree is flattened to
the canonical OTLP wire shape and POSTed to a collector endpoint
(/v1/metrics), with optional gzip like the reference's otel.gzip."""

import gzip
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from cflog2otel_spark.config import Config
from cflog2otel_spark.export import export_otlp_http, to_wire
from cflog2otel_spark.golden import encode_otlp
from cflog2otel_spark.pipeline import run_pipeline

from .conftest import CONFIGS


class _Collector(BaseHTTPRequestHandler):
    received: list[tuple[str, dict, dict]] = []

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"]))
        if self.headers.get("Content-Encoding") == "gzip":
            body = gzip.decompress(body)
        _Collector.received.append((self.path, dict(self.headers), json.loads(body)))
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):
        pass


def _serve():
    srv = HTTPServer(("127.0.0.1", 0), _Collector)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def test_to_wire_shape(spark, cf_fixture_df):
    cfg = Config.load(f"{CONFIGS}/multi_metrics.json")
    result = run_pipeline(spark, cfg, cf_fixture_df, cache="none")
    reqs = encode_otlp(result, cfg)
    wire = to_wire(reqs[0])
    rm = wire["resourceMetrics"][0]
    # canonical OTLP JSON: camelCase, flattened oneofs, string u64 nanos
    attr0 = rm["resource"]["attributes"][0]
    assert set(attr0["value"]) <= {"stringValue", "boolValue", "intValue", "doubleValue"}
    metrics = {m["name"]: m for m in rm["scopeMetrics"][0]["metrics"]}
    sum_dp = metrics["http.server.total_bytes"]["sum"]["dataPoints"][0]
    assert "asDouble" in sum_dp and isinstance(sum_dp["startTimeUnixNano"], str)
    count_dp = metrics["http.server.requests"]["sum"]["dataPoints"][0]
    assert "asInt" in count_dp
    assert metrics["http.server.requests"]["sum"]["isMonotonic"] is True


def test_export_posts_to_collector(spark, cf_fixture_df):
    cfg = Config.load(f"{CONFIGS}/request_time_histogram.json")
    result = run_pipeline(spark, cfg, cf_fixture_df, cache="none")
    reqs = encode_otlp(result, cfg)

    srv, base = _serve()
    try:
        _Collector.received.clear()
        n = export_otlp_http(reqs, base)
        assert n == len(reqs)
        path, headers, body = _Collector.received[0]
        assert path == "/v1/metrics"
        hist = body["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0]["histogram"]
        dp = hist["dataPoints"][0]
        assert dp["bucketCounts"] and all(isinstance(x, str) for x in dp["bucketCounts"])
        assert dp["explicitBounds"]

        # gzip path (otel.gzip in the reference config)
        _Collector.received.clear()
        export_otlp_http(reqs, base, gzip=True)
        _, headers, body2 = _Collector.received[0]
        assert headers.get("Content-Encoding") == "gzip"
        assert body2 == body
    finally:
        srv.shutdown()


def test_cli_export_otlp(spark, cf_fixture_df, tmp_path):
    """main.py --export-otlp posts every aggregated request to the
    collector endpoint (config otel.gzip honored end-to-end)."""
    import subprocess
    import sys

    corpus_path = str(tmp_path / "corpus")
    cf_fixture_df.write.parquet(corpus_path)
    srv, base = _serve()
    try:
        _Collector.received.clear()
        proc = subprocess.run(
            [
                sys.executable, "main.py",
                "--config", f"{CONFIGS}/multi_metrics.json",  # otel.gzip: true
                "--input", corpus_path,
                "--export-otlp", base,
                "--master", "local[2]",
            ],
            cwd="/root/repo", capture_output=True, text=True, timeout=420,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert '"exported": 1' in proc.stderr
        path, headers, body = _Collector.received[0]
        assert path == "/v1/metrics"
        assert headers.get("Content-Encoding") == "gzip"
        names = {
            m["name"]
            for m in body["resourceMetrics"][0]["scopeMetrics"][0]["metrics"]
        }
        assert names == {"http.server.requests", "http.server.total_bytes"}
    finally:
        srv.shutdown()
