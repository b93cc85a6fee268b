"""Backfill / bounded-lateness selection (reference: app.go:322-368).

Semantics on an S3 event for trigger object X with key
{prefix}{distID}.{datehour}.{hash}.gz, backfill enabled, tolerance T:

  - ALL lines of X are kept (no line gate on the trigger object).
  - Sibling objects sharing {prefix}{distID}.{datehour}. are re-read iff
    eventTime - lastModified <= T   (object-level gate, app.go:341-344).
  - Within a re-read sibling, a line is kept iff
    eventTime - line.timestamp <= T (line-level gate, app.go:354-361).
  - Objects under a different (distID, datehour) prefix are out of scope
    (the ListObjectsV2 prefix).

Spark mapping: the object manifest (source -> last_modified) is tiny and
broadcast; selection is a single filter over the corpus — with an Iceberg /
parquet layout partitioned by source, the IN-list on eligible sources
becomes partition pruning, so a backfill invocation reads exactly one
(distID, datehour) slice of a 100 TB table. Re-emission per invocation is
idempotent-by-window (delta temporality; T4 in SURVEY.md §2.6) — pair with
a dynamic-overwrite sink keyed on (window, source-hour).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _key_parts(key: str) -> tuple[str, str, str] | None:
    """(prefix, distID, datehour) of an object key, None if unparseable
    (mirrors ParseCFStandardLogObjectKey, app.go:434-450)."""
    if not key.endswith(".gz"):
        return None
    slash = key.rfind("/")
    prefix, base = key[: slash + 1], key[slash + 1 : -3]
    parts = base.split(".", 2)
    if len(parts) != 3:
        return None
    return prefix, parts[0], parts[1]


def backfill_select(
    parsed: DataFrame,
    trigger_source: str,
    event_time: str | datetime,
    tolerance_seconds: float,
    last_modified: dict[str, str | datetime],
    source_col: str = "source",
) -> DataFrame:
    """Select the rows one backfill-enabled invocation would aggregate.

    `last_modified` maps every candidate object key -> its LastModified
    timestamp (the listing manifest; trigger may be included or not).
    """
    kp = _key_parts(trigger_source)
    if kp is None:
        # unparseable trigger key -> skip the file (app.go:306-313)
        return parsed.limit(0)
    prefix, dist, datehour = kp
    sibling_prefix = f"{prefix}{dist}.{datehour}."

    ev = F.lit(str(event_time)).cast("timestamp")
    # object-level gate, driver-side (the manifest is small metadata)
    import datetime as _dt

    def _to_dt(x):
        if isinstance(x, _dt.datetime):
            return x
        return _dt.datetime.fromisoformat(str(x).replace("Z", "+00:00"))

    ev_dt = _to_dt(event_time)
    eligible = [
        src
        for src, lm in last_modified.items()
        if src != trigger_source
        and src.startswith(sibling_prefix)
        and (ev_dt - _to_dt(lm).replace(tzinfo=ev_dt.tzinfo)).total_seconds()
        <= tolerance_seconds
    ]

    is_trigger = F.col(source_col) == trigger_source
    is_sibling = F.col(source_col).isin(eligible) if eligible else F.lit(False)
    line_ok = (
        F.col("timestamp").isNotNull()
        & (
            F.unix_timestamp(ev) - F.unix_timestamp(F.col("timestamp"))
            <= F.lit(float(tolerance_seconds))
        )
    )
    return parsed.filter(is_trigger | (is_sibling & line_ok))


def manifest_from_listing(base_dir: str, suffix: str = ".gz") -> dict[str, str]:
    """Build the backfill manifest (object key -> LastModified) from a
    local directory listing — the deployment stand-in for the reference's
    ListObjectsV2 flow (app.go:322-336): keys are file paths relative to
    `base_dir`, LastModified is the file mtime (UTC). An Iceberg deployment
    derives the same map from snapshot file metadata; an S3 one from the
    real listing. Driver-side: the manifest is tiny object metadata, never
    row data."""
    import os
    from datetime import datetime, timezone

    out: dict[str, str] = {}
    for root, _dirs, files in os.walk(base_dir):
        for f in files:
            if suffix and not f.endswith(suffix):
                continue
            full = os.path.join(root, f)
            key = os.path.relpath(full, base_dir)
            mt = datetime.fromtimestamp(os.path.getmtime(full), tz=timezone.utc)
            out[key] = mt.strftime("%Y-%m-%d %H:%M:%S")
    return out
