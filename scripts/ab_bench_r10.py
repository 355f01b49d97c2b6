"""A/B subset bench: median-of-N wall times for a fixed query list in
ONE session (same-session comparison resists the shared-VM throttling
that makes cross-run totals jump 2-4x).

Usage: python scripts/ab_bench_r10.py <label> [sf_dir] [name ...]
Appends one JSON line per query to /tmp/ab_r10.jsonl with the label.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

RUNS = int(os.environ.get("AB_RUNS", "3"))

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
    "lake_cdf_stream_rollup",
    "lake_bloom_point_lookup",
    "cdf_replay_invariant",
    "qty_price_spearman",
    "price_mad_outliers",
    "pq_adc_invariant",
    "near_dup_clusters",
    "er_golden_customers",
    "part_coorder_triangles",
    "supplier_part_pagerank",
    "minhash_lsh_invariant",
    "simhash_invariant",
    "sensor_feed_rollup",
    "stream_stateful_running_totals",
    "nation_market_share",
    "pricing_summary",
    "quality_classifier_eval",
    "kmeans_assign_invariant",
    "zorder3_compact_scan",
]


def main() -> int:
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or DEFAULT_SET
    spark = get_spark("ab-r10")
    spark.sparkContext.setLogLevel("ERROR")

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()
    all_q = q.spark_queries()
    out_path = "/tmp/ab_r10.jsonl"
    total = 0.0
    for name in names:
        fn = all_q[name]
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}", flush=True)
            continue
        spark.catalog.clearCache()
        got = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            got.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        got.sort()
        med = got[len(got) // 2] if len(got) % 2 else (got[len(got) // 2 - 1] + got[len(got) // 2]) / 2
        total += med
        rec = {"label": label, "name": name, "med_s": round(med, 3),
               "runs": [round(x, 3) for x in got]}
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"{med:7.2f}s  {name}", flush=True)
    print(f"TOTAL {label}: {total:.1f}s over {len(names)} queries", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
