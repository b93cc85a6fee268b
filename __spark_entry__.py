"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship CF-pipeline query at sf0.001
queries()     -> {name: (spark, sf_dir) -> DataFrame} per SURVEY.md §2
oracle_sql()  -> {name: DuckDB SQL} oracle twins (same column names/aliases)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse->enrich->window->count pipeline at sf0.001."""
    from cflog2otel_spark.plans.driver_queries import q_cf_count_by_status

    return q_cf_count_by_status(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cflog2otel_spark.plans.driver_queries import QUERIES

    return {name: fns[0] for name, fns in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from cflog2otel_spark.plans.driver_queries import QUERIES

    return {name: fns[1]() for name, fns in QUERIES.items() if fns[1] is not None}
