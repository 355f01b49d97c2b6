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
    entries; the rotation must fill that window with (a) oracled
    queries whose LATEST committed CORRECTNESS_r*.json row FAILED (so
    fixes get re-verified externally), then (b) oracled queries no
    snapshot has seen yet — so each round contributes 50 externally
    meaningful rows."""
    import glob
    import json
    import os

    names = list(q.spark_queries())
    oracled = set(q.oracle_queries())
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, dict] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        for name, row in json.load(open(p)).items():
            latest[name] = row if isinstance(row, dict) else {}
    failed = {
        n
        for n, row in latest.items()
        if any(
            row.get(k) is False
            for k in ("rows_match", "schema_match", "hash_match")
        )
        or (
            row.get("err") not in (None, "", "no_oracle")
            and not any(
                row.get(k) is True
                for k in ("rows_match", "schema_match", "hash_match")
            )
        )
    }
    refresh = [n for n in names if n in failed and n in oracled]
    fresh = [n for n in names if n in oracled and n not in latest]
    fresh_rows_only = [n for n in names if n not in oracled and n not in latest]
    head_available = refresh + fresh + fresh_rows_only
    window = names[: min(50, len(head_available))]
    # failed queries lead the window; the rest of the window is unseen,
    # oracled entries before rows-only ones (the stronger check first)
    assert window[: len([n for n in window if n in failed])] == [
        n for n in window if n in failed
    ]
    assert all(n in failed or n not in latest for n in window)
    unseen = [n for n in window if n not in failed]
    first_rows_only = next(
        (i for i, n in enumerate(unseen) if n not in oracled), len(unseen)
    )
    assert all(n not in oracled for n in unseen[first_rows_only:])
    # and nothing is lost: the full registry is still served
    assert set(names) == set(q.spark_queries())


def test_readme_counts_match_registry():
    """Registry hygiene (VERDICT r4 item 8): the README's stated query
    counts are generated claims, not hand-maintained ones — drift here
    confuses the audit trail. The README must state the exact
    len(spark_queries()) and len(oracle_queries())."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    text = open(os.path.join(root, "README.md")).read()
    m = re.search(r"\((\d+) registered queries, (\d+) with", text)
    assert m, "README.md no longer states the registry counts"
    assert int(m.group(1)) == len(q.spark_queries()), (
        f"README says {m.group(1)} registered queries, registry has "
        f"{len(q.spark_queries())} — run scripts/refresh_counts.py"
    )
    assert int(m.group(2)) == len(q.oracle_queries()), (
        f"README says {m.group(2)} oracled queries, registry has "
        f"{len(q.oracle_queries())} — run scripts/refresh_counts.py"
    )
