"""Canonical golden-JSON encoder + comparator.

Re-creates the reference's unit-test golden shape (goldie snapshots of the
Go OTel SDK metricdata tree, /root/reference/aggregation_test.go:20-51 and
testdata/fixtures/*.golden.json) from our sink DataFrames, and compares
trees canonically:

  - data points sorted by (StartTime, attrs) — the reference's native order
    is first-seen and non-deterministic under a shuffle (SURVEY.md §2.4 A12)
  - integral floats normalized to ints (Go json marshals 1176.0 as 1176)
  - resources sorted by their attribute sets; metrics stay in config order
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from typing import Any

from .pipeline import PipelineResult


def _rfc3339(dt: datetime) -> str:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _attrs_json(pairs) -> list[dict]:
    return [
        {"Key": p["key"], "Value": {"Type": "STRING", "Value": p["value"]}}
        for p in pairs
    ]


def encode_golden(result: PipelineResult, config) -> list[dict]:
    """Collect sinks -> list of ResourceMetrics JSON trees (usually one)."""
    by_resource: dict[str, dict] = {}
    ordered_names = sorted(result.sinks, key=lambda n: result.metric_index[n])
    for name in ordered_names:
        m = config.metrics[result.metric_index[name]]
        rows = [r.asDict(recursive=True) for r in result.sinks[name].collect()]
        for row in rows:
            rkey = json.dumps(_attrs_json(row["resource_attrs"]), sort_keys=True)
            res = by_resource.setdefault(
                rkey,
                {
                    "Resource": _attrs_json(row["resource_attrs"]),
                    "ScopeMetrics": [
                        {
                            "Scope": {
                                "Name": row["scope_name"],
                                "Version": row["scope_version"],
                                "SchemaURL": row["scope_schema_url"],
                            },
                            "Metrics": [],
                        }
                    ],
                },
            )
            metrics = res["ScopeMetrics"][0]["Metrics"]
            metric = next((x for x in metrics if x["Name"] == name), None)
            if metric is None:
                data: dict[str, Any] = {"DataPoints": [], "Temporality": row["temporality"]}
                if m.type in ("Count", "Sum"):
                    data["IsMonotonic"] = row["is_monotonic"]
                metric = {
                    "Name": name,
                    "Description": row["metric_description"],
                    "Unit": row["metric_unit"],
                    "Data": data,
                }
                metrics.append(metric)
            dp: dict[str, Any] = {
                "Attributes": _attrs_json(row["attrs"]),
                "StartTime": _rfc3339(row["window_start"]),
                "Time": _rfc3339(row["window_end"]),
            }
            if m.type == "Count":
                dp["Value"] = int(row["value"])
            elif m.type == "Sum":
                dp["Value"] = row["value"]
            else:
                dp["Count"] = int(row["count"])
                dp["Bounds"] = row["bounds"]
                dp["BucketCounts"] = row["bucket_counts"]
                if not m.no_min_max:
                    dp["Min"] = row["min"]
                    dp["Max"] = row["max"]
                dp["Sum"] = row["sum"]
            metric["Data"]["DataPoints"].append(dp)
    out = [by_resource[k] for k in sorted(by_resource)]
    return [canonicalize(r) for r in out]


def canonicalize(tree: Any) -> Any:
    """Normalize a golden tree for order-insensitive comparison."""
    tree = _norm_numbers(tree)
    if isinstance(tree, dict) and "ScopeMetrics" in tree:
        for sm in tree["ScopeMetrics"]:
            for metric in sm.get("Metrics", []):
                dps = metric.get("Data", {}).get("DataPoints", [])
                dps.sort(key=lambda d: (d.get("StartTime", ""), json.dumps(d.get("Attributes", []), sort_keys=True)))
    return tree


def _norm_numbers(x: Any) -> Any:
    if isinstance(x, float) and x.is_integer():
        return int(x)
    if isinstance(x, dict):
        return {k: _norm_numbers(v) for k, v in x.items()}
    if isinstance(x, list):
        return [_norm_numbers(v) for v in x]
    return x


def load_reference_golden(path: str) -> dict:
    with open(path) as fh:
        return canonicalize(json.load(fh))


def diff_golden(ours: Any, theirs: Any) -> str:
    a = json.dumps(ours, indent=1, sort_keys=True)
    b = json.dumps(theirs, indent=1, sort_keys=True)
    if a == b:
        return ""
    import difflib

    return "\n".join(
        difflib.unified_diff(b.splitlines(), a.splitlines(), "reference", "ours", lineterm="")
    )
