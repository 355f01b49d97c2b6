"""Round-8 A/B: settle the r7 driver-vs-builder gap on the dedup
family (VERDICT r7 item 4 — `simhash_invariant` 3.87→4.54,
`pq_adc_invariant` 1.52→2.22, `near_dup_pairs_prefix` 2.46→3.15 in
the driver's r7 run, code byte-unchanged).

Methodology = the r7 corr-matrix playbook (PLANS.md): ONE session,
bench-identical warm-up (UDF worker pool + full-registry sf0.001 warm
pass), then ALTERNATING attempts of the three queries at sf0.1 (A B C
A B C ... ×5) so a minutes-scale neighbor-load episode hits all three
equally instead of whichever ran inside it; JVM code-cache MXBeans
read in-process at the end to exclude session-state decay.

Run on a QUIET machine: ``python scripts/ab_dedup_r8.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q  # noqa: E402
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark  # noqa: E402

TARGETS = {
    "simhash_invariant": 4.0,
    "pq_adc_invariant": 1.9,
    "near_dup_pairs_prefix": 2.8,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mdl-ab-dedup")
    spark.sparkContext.setLogLevel("ERROR")

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()
    qs = q.spark_queries()
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in qs.items():
        try:
            fn(spark, warm_dir).count()
        except Exception:
            pass
        spark.catalog.clearCache()

    names = list(TARGETS)
    attempts: dict[str, list[float]] = {n: [] for n in names}
    for _round in range(5):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            attempts[n].append(round(time.perf_counter() - t0, 3))

    def med(xs):
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    # JVM code-cache state (exclude JIT/codegen decay in-process)
    jvm = spark._jvm
    pools = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
    heaps = {}
    for i in range(pools.size()):
        p = pools.get(i)
        nm = p.getName()
        if "CodeHeap" in nm or "Metaspace" in nm:
            heaps[nm] = round(p.getUsage().getUsed() / 1e6)
    out = {
        "probe": "ab_dedup_r8",
        "sf_dir": sf_dir,
        "medians": {n: med(v) for n, v in attempts.items()},
        "attempts": attempts,
        "targets": TARGETS,
        "within_target": {
            n: med(attempts[n]) <= TARGETS[n] for n in names
        },
        "jvm_pools_mb": heaps,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
