"""Lint EVERY registered query's physical plan for 100 TB
anti-patterns (plans/lint.lint_plan) at the smoke SF. Queries whose
SEMANTICS require a flagged shape (exact global KS sort, stream drains
over memoized sinks, bounded driver-side probes) are allowlisted with
the reason printed, so new regressions stand out.

Usage: python scripts/lint_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

# code -> {query: reason} documented exemptions
ALLOW = {
    "global-window": {
        "orders_price_ks_drift": "exact KS needs ONE global CDF ordering (documented small-sample audit; psi_drift is the scale path)",
        "ann_multitable_invariant": "window input is the top-k search RESULT (<= 10 rows by construction), never the corpus",
        "customer_balance_deciles": "cumulative window runs over the VALUE HISTOGRAM (distinct 2-decimal balances, domain-bounded ~1M rows), never corpus rows — the rewrite that replaced the global ntile",
        "qty_price_spearman": "average-rank windows run over the two VALUE HISTOGRAMS (distinct quantities / distinct price cents, domain-bounded), never corpus rows — the construction that avoids a corpus-wide rank sort",
        "hybrid_search_rrf": "rank windows run over the two top-k retrieval RESULTS (<= 20 rows each by construction), never the corpus",
        "daily_user_reach": "cumulative window runs over the PER-DAY aggregate (calendar-bounded #days rows), never event rows — the first-seen construction that replaced the expanding distinct",
        "epoch_upsample_order": "rank window runs over the distributed top-k RESULT (<= 10 rows by construction — orderBy+limit compiles to TakeOrderedAndProject), never the upsampled corpus",
        "vocab_zipf_slope": "rank window runs over the top-100 term RESULT (orderBy+limit = TakeOrderedAndProject), never the vocabulary",
        "part_type_revenue_pareto": "cumulative window runs over the per-TYPE aggregate (p_type is a 150-value bounded dimension), never lineitem rows — the customer_balance_deciles precedent",
    },
    "exact-percentile": {
        "hourly_event_anomalies": "medians run over PER-HOUR pre-aggregates (calendar-bounded: <= #hours-in-range rows split across 24 hod groups), never event rows — the buffer is bounded by the date range, not the corpus",
    },
    "mega-filter": {
        "ann_lsh_invariant": "the anti-join's cosine verify IS the filter: one dim-proportional HOF evaluated once per candidate, no duplicated inline",
        "ann_ivf_invariant": "same — exact-cosine verify filter, evaluated once per candidate",
    },
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "16g")
        .appName("lint-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    bad: list[tuple[str, str, str]] = []
    names = list(q.spark_queries())
    for i, name in enumerate(names):
        try:
            df = q.spark_queries()[name](spark, sf_dir)
            findings = lint_plan(df)
        except Exception as e:  # noqa: BLE001
            print(f"[{i + 1}/{len(names)}] SKIP {name}: {type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        flagged = []
        for f in findings:
            reason = ALLOW.get(f.code, {}).get(name)
            if reason:
                flagged.append(f"{f.code} (allowed: {reason[:60]})")
            else:
                bad.append((name, f.code, f.message[:200]))
                flagged.append(f"{f.code} <== NOT ALLOWED")
        status = "; ".join(flagged) if flagged else "clean"
        print(f"[{i + 1}/{len(names)}] {name}: {status}", flush=True)
    print(f"\n{len(bad)} unallowed findings")
    for name, code, detail in bad:
        print(f"  {name}: {code}: {detail}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
