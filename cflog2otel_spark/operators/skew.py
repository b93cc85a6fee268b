"""Skew handling: explicit key salting for hot-key aggregation.

The synthetic corpus (and real CloudFront fleets) have hot distributions —
one `source`/distribution can be ~50% of all rows (FIXTURES.md §1). AQE's
skew-join splitting handles joins; for AGGREGATIONS a hot grouping key
still lands every row in one reducer partition. Classic fix: two-phase
salted aggregation —

  phase 1: groupBy(keys..., salt = crc32(row-id) % n_salts)  -> partials
  phase 2: groupBy(keys...) merging partials

All our metric aggregates are algebraic (count/sum/min/max/bucket-count
sums merge associatively), so the rewrite is exact. Spark's hash
aggregation already does map-side partial combine, which usually makes
salting unnecessary — the measured win shows up when the number of
groups per hot key is tiny (pure reduce-side hot spot). The utility
exists so a 1000-executor deployment can flip it on per metric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


MERGEABLE = {"count", "sum", "min", "max"}


def salted_aggregate(
    df: DataFrame,
    keys: list[str | Column],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregation with a salt sub-key.

    aggs: {out_name: (fn, col)} with fn in {count, sum, min, max}; `col` is
    ignored for count. `salt_on` defaults to a uniform pseudo-random salt
    from the row content (monotonically_increasing_id is partition-stable).
    """
    for name, (fn, _c) in aggs.items():
        if fn not in MERGEABLE:
            raise ValueError(f"{name}: {fn} is not mergeable; salting would be wrong")

    salt_src = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    if salt_src is None:
        salt_src = F.monotonically_increasing_id()
    salt = (F.crc32(salt_src.cast("string")) % n_salts).alias("__salt")

    phase1_aggs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"__p_{name}"))
        else:
            phase1_aggs.append(getattr(F, fn)(col).alias(f"__p_{name}"))
    partial = df.groupBy(*keys, salt).agg(*phase1_aggs)

    phase2_aggs = []
    for name, (fn, _col) in aggs.items():
        merge = "sum" if fn in ("count", "sum") else fn
        phase2_aggs.append(getattr(F, merge)(f"__p_{name}").alias(name))
    return partial.groupBy(*keys).agg(*phase2_aggs)


def hot_keys(df: DataFrame, key: str, threshold_fraction: float = 0.2) -> list:
    """Keys holding more than `threshold_fraction` of rows (driver-side,
    one cheap count-by-key — the skew detector feeding manifests/salting).
    """
    total = df.count()
    if total == 0:
        return []
    counts = df.groupBy(key).count().filter(
        F.col("count") >= threshold_fraction * total
    )
    return [r[key] for r in counts.collect()]
