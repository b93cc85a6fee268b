"""Lambda-event unwrapping: SQS -> SNS -> S3 notification records.

Mirrors the reference's UnwrapEvent pipeline (/root/reference/app.go:58-177,
composition app.go:175-177: SNS(SQS(event))) and Invoke's S3-record
collection (app.go:179-203). This is driver-side control-plane work — the
event JSON is a few KB; the cluster never sees it. The extracted records
feed the data plane: object key -> trigger_source / partition-pruned scan,
eventTime -> backfill gate, bucket/object fields -> CEL context columns.

Go's json.Unmarshal binds fields case-insensitively and treats missing
fields as zero values; decode "errors" (the pass-through paths) happen only
on shape mismatches (non-object event, Records not a list, ...). The
helpers below reproduce exactly that.
"""

from __future__ import annotations

import json
from typing import Any, Iterable, Iterator


def _get_ci(d: dict, key: str, default: Any = None) -> Any:
    """Case-insensitive field lookup (Go encoding/json binding rule:
    exact match preferred, else case-insensitive)."""
    if key in d:
        return d[key]
    lk = key.lower()
    for k, v in d.items():
        if k.lower() == lk:
            return v
    return default


def _parse(raw: Any) -> Any:
    if isinstance(raw, (dict, list)):
        return raw
    try:
        return json.loads(raw)
    except (TypeError, ValueError):
        return None  # unmarshal error -> pass-through paths


def _unwrap_sqs(events: Iterable[Any]) -> Iterator[Any]:
    """app.go:58-107: yield each SQS record's body; non-SQS events pass
    through unchanged."""
    for ev in events:
        obj = _parse(ev)
        if not isinstance(obj, dict):
            yield ev
            continue
        records = _get_ci(obj, "Records")
        if not isinstance(records, list) or not records:
            # single SQSMessage form (app.go:71-90)
            if _get_ci(obj, "eventSource") == "aws:sqs" and isinstance(
                _get_ci(obj, "body"), str
            ):
                yield _get_ci(obj, "body")
            else:
                yield ev
            continue
        # app.go:92-104: bodies stream out as encountered; the FIRST non-SQS
        # record yields the original event and stops this event's records
        # (bodies already yielded stay yielded — exact Go loop order)
        for rec in records:
            if not isinstance(rec, dict) or _get_ci(rec, "eventSource") != "aws:sqs":
                yield ev
                break
            yield _get_ci(rec, "body", "")


def _unwrap_sns(events: Iterable[Any]) -> Iterator[Any]:
    """app.go:109-173: yield each SNS record's Message; non-SNS events pass
    through unchanged."""
    for ev in events:
        obj = _parse(ev)
        if not isinstance(obj, dict):
            yield ev
            continue
        records = _get_ci(obj, "Records")
        if not isinstance(records, list) or not records:
            # single SNSEventRecord form (app.go:124-139)
            if _get_ci(obj, "EventSource") == "aws:sns" and isinstance(
                _get_ci(obj, "Sns"), dict
            ):
                yield _get_ci(_get_ci(obj, "Sns"), "Message", "")
                continue
            # bare SNSEntity form (app.go:140-155)
            if _get_ci(obj, "MessageId"):
                yield _get_ci(obj, "Message", "")
                continue
            yield ev
            continue
        # app.go:158-171: same streaming order as the SQS loop
        for rec in records:
            if not isinstance(rec, dict) or _get_ci(rec, "EventSource") != "aws:sns":
                yield ev
                break
            yield _get_ci(_get_ci(rec, "Sns", {}) or {}, "Message", "")


def unwrap_event(event: Any) -> list[Any]:
    """UnwrapEvent (app.go:175-177): SNS-unwrap of the SQS-unwrap of one
    raw event. Elements are raw JSON strings (or the original value when a
    stage passed it through)."""
    return list(_unwrap_sns(_unwrap_sqs([event])))


def collect_s3_records(event: Any) -> list[dict]:
    """Invoke's record collection (app.go:186-199): parse every unwrapped
    event as an S3Event, skipping non-S3 events, and concatenate Records."""
    records: list[dict] = []
    for ev in unwrap_event(event):
        obj = _parse(ev)
        if not isinstance(obj, dict):
            continue
        recs = _get_ci(obj, "Records")
        if not isinstance(recs, list):
            continue
        for rec in recs:
            if isinstance(rec, dict):
                records.append(rec)
    return records


def s3_record_context(record: dict) -> dict:
    """One S3EventRecord -> the trigger/context fields the data plane needs
    (NewCELVariables, cel.go:48-69): trigger source key, event time, and the
    bucket.*/object.* CEL namespace values."""
    s3 = _get_ci(record, "s3", {}) or {}
    bucket = _get_ci(s3, "bucket", {}) or {}
    obj = _get_ci(s3, "object", {}) or {}
    owner = _get_ci(bucket, "ownerIdentity", {}) or {}
    return {
        "source": _get_ci(obj, "key", ""),
        "event_time": _get_ci(record, "eventTime", ""),
        "bucket_name": _get_ci(bucket, "name", ""),
        "bucket_arn": _get_ci(bucket, "arn", ""),
        "bucket_owner_principal_id": _get_ci(owner, "principalId", ""),
        "object_size": _get_ci(obj, "size", 0),
        "object_etag": _get_ci(obj, "eTag", ""),
        "object_version_id": _get_ci(obj, "versionId", ""),
        "object_sequencer": _get_ci(obj, "sequencer", ""),
    }


def dummy_s3_notification(s3_url: str) -> str:
    """-s3-url convenience entry: synthesize the same dummy S3 notification
    the reference builds from an s3:// URL (cmd/cflog2otel/main.go:153-185
    generateDummyS3Notification) — constant etag/version/sequencer, size
    1024, region from $AWS_REGION, eventTime = now."""
    import datetime
    import json as _json
    import os
    from urllib.parse import unquote, urlsplit

    u = urlsplit(s3_url)
    if u.scheme != "s3":
        raise ValueError("invalid s3 url")
    # Go url.Parse percent-decodes Path/Host before the reference trims the
    # prefix (main.go:153-185); urlsplit leaves %XX verbatim, so an encoded
    # URL would target a different object key (ADVICE r6)
    bucket = unquote(u.netloc)
    key = unquote(u.path).lstrip("/")
    now = datetime.datetime.now(datetime.timezone.utc)
    return _json.dumps({
        "Records": [{
            "eventVersion": "2.1",
            "eventSource": "aws:s3",
            "awsRegion": os.environ.get("AWS_REGION", ""),
            "eventTime": now.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "eventName": "ObjectCreated:Put",
            "s3": {
                "s3SchemaVersion": "1.0",
                "configurationId": "testConfigRule",
                "bucket": {
                    "name": bucket,
                    "arn": f"arn:aws:s3:::{bucket}",
                },
                "object": {
                    "key": key,
                    "size": 1024,
                    "eTag": "0123456789abcdef0123456789abcdef",
                    "versionId": "096fKKXTRTtl3on89fVO.nfljtsv6qko",
                    "sequencer": "0A1B2C3D4E5F678901",
                },
            },
        }]
    })
