"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``multi_source_data_lake_with_etl_pipeline_spark``
package; this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing-summary aggregation, SURVEY.md §7.1) on
    sf0.001; the driver checks rows>0 and a stable schema."""
    return q.pricing_summary(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/query from SURVEY.md §2."""
    return q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each entry in ``queries()`` (omitted
    for non-SQL-expressible ops → driver does a rows-only check)."""
    return q.oracle_queries()
