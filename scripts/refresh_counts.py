"""Rewrite the README's registry-count line from the live registry —
the single source of truth for "N registered queries, M with oracles"
(pinned by tests/test_queries_vs_oracle.test_readme_counts_match_registry).

Usage: python scripts/refresh_counts.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "README.md")
    text = open(path).read()
    n, m = len(q.spark_queries()), len(q.oracle_queries())
    new, subs = re.subn(
        r"\(\d+ registered queries, \d+ with",
        f"({n} registered queries, {m} with",
        text,
    )
    if not subs:
        print("README.md count line not found", file=sys.stderr)
        return 1
    if new != text:
        open(path, "w").write(new)
        print(f"README.md updated: {n} registered, {m} oracled")
    else:
        print(f"README.md already current: {n} registered, {m} oracled")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
