"""Scale probe for the round-4 additions: triangle counting, PMI
collocations, z-order write + pruned scan, snapshot diff.

Protocol (matches scale_probe_stats.py): one session, warm best-of-2
per (query, sf), sf0.01 vs sf0.1 = 10x base rows, local[32].

Usage: python scripts/scale_probe_r4_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from multi_source_data_lake_with_etl_pipeline_spark import queries as q

PROBES = [
    "part_coorder_triangles",
    "pmi_collocations",
    "zorder_pruned_scan",
    "snapshot_diff_orders",
    "daily_user_reach",
]


def main() -> int:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("scale-probe-r4-ops")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    fns = q.spark_queries()
    for name in PROBES:
        row = [name]
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                fns[name](spark, sf).collect()
                best = min(best, time.time() - t0)
            row.append(f"{best:.2f}s")
        print(" | ".join(row), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
