"""Scale curves for the round-4 exact-analytics operators: corr
matrix / Spearman / group-wise regression / integer PageRank, timed
at sf0.01 vs sf0.1 (10x lineitem rows) in ONE session, warm
best-of-2. Expectation: the moment-sum ops are scan-bound (~linear in
bytes, sublinear in wall clock at this size because fixed job
overhead dominates); PageRank adds one edges⋈ranks shuffle join + one
groupBy per iteration, so its curve tracks the edge count.

Usage: python scripts/scale_probe_stats.py  (markdown rows for SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

QUERIES = [
    "lineitem_corr_matrix",
    "qty_price_spearman",
    "price_qty_regression_by_flag",
    "supplier_part_pagerank",
]


def main():
    import multi_source_data_lake_with_etl_pipeline_spark.queries as q

    spark = get_spark("scale-probe-stats")
    spark.sparkContext.setLogLevel("ERROR")
    reg = q.spark_queries()
    results: dict[str, dict[str, float]] = {}
    for sf in ("0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        for name in QUERIES:
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                reg[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            results.setdefault(name, {})[sf] = best
    print("| Query | sf0.01 | sf0.1 (10x rows) | ratio |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[name]["0.01"], results[name]["0.1"]
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {b / a:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
