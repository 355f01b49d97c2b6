"""Every registered query with an oracle must match DuckDB at sf0.001 —
local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from multi_source_data_lake_with_etl_pipeline_spark import queries as q

from .oracle_harness import compare_query

_CASES = sorted(q.oracle_queries().keys())


@pytest.mark.parametrize("name", _CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    fn = q.spark_queries()[name]
    oracle = q.oracle_queries()[name]
    ok, msg = compare_query(spark, sf_dir, fn, oracle)
    assert ok, f"{name}: {msg}"


def test_all_queries_return_rows(spark, sf_dir):
    for name, fn in q.spark_queries().items():
        assert fn(spark, sf_dir).count() > 0, f"{name} returned 0 rows"
