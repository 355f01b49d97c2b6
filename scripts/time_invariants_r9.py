"""Round-9 local timing probe for the dedup invariant trio (mimics
bench.py: warm at sf0.001, then median-of-3 at sf0.1)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

NAMES = sys.argv[1:] or [
    "simhash_invariant",
    "minhash_incremental_invariant",
    "minhash_lsh_invariant",
]


def main() -> None:
    spark = get_spark("mdl-inv-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()
    qs = q.spark_queries()
    for name in NAMES:
        qs[name](spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()
    for name in NAMES:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, "/root/testdata/sf0.1").count()
            ts.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name}: median={sorted(ts)[1]:.2f} all={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()
