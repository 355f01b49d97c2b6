"""Dump .explain('formatted') for named queries to plans/r11/.

For audit-shaped queries (lake build + read-back) the returned frame's
plan is the final aggregate over the lake read; the commit-machinery
evidence lives in job counts (scripts/profile_r10.py) — both are
committed so the round's plan claims are checkable offline.

Usage: python scripts/dump_plans_r11.py <label> [sf_dir] [name ...]
Writes plans/r11/<name>_<label>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

DEFAULT_SET = [
    "lake_merge_evolution_audit",
    "lake_partition_maintenance_audit",
    "cdc_apply_audit",
    "lake_sql_dml_audit",
    "lake_merge_clauses_audit",
    "lake_bucket_point_lookup",
    "lake_clone_divergence",
    "lake_history_ops",
    "dv_merge_parity_audit",
    "dv_delete_parity_audit",
    "mv_incremental_invariant",
    "lake_bloom_point_lookup",
    "cdf_replay_invariant",
    "zorder3_compact_scan",
    "lake_partition_evolution_audit",
    "delete_keys_purge_audit",
    "lake_update_audit",
    "small_file_compaction_audit",
    "qty_price_spearman",
    "price_mad_outliers",
    "pq_adc_invariant",
    "kmeans_assign_invariant",
    "part_coorder_triangles",
    "supplier_part_pagerank",
    "er_golden_customers",
]


def main() -> int:
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_SET
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r11")
    spark.sparkContext.setLogLevel("ERROR")
    all_q = q.spark_queries()
    for name in names:
        try:
            df = all_q[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # keep going; record the failure
            plan = f"PLAN-FAIL: {e}"
        with open(os.path.join(out_dir, f"{name}_{label}.txt"), "w") as f:
            f.write(plan)
        print(f"dumped {name}_{label}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
