"""Full oracled-query sweep at an arbitrary SF dir — local mirror of the
driver's correctness gate, run manually before each round ships.

Usage: python scripts/oracle_sweep.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from pyspark.sql import SparkSession

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from oracle_harness import compare_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .appName("oracle-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[tuple[str, str]] = []
    names = [n for n in q.oracle_queries() if not only or n in only]
    t0 = time.time()
    for i, name in enumerate(names):
        fn = q.spark_queries()[name]
        oracle = q.oracle_queries()[name]
        t = time.time()
        try:
            ok, msg = compare_query(spark, sf_dir, fn, oracle)
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {str(e)[:300]}"
        status = "ok" if ok else "FAIL"
        print(f"[{i + 1}/{len(names)}] {status} {name} ({time.time() - t:.1f}s)" + ("" if ok else f" :: {msg}"), flush=True)
        if not ok:
            failures.append((name, msg))
    print(f"\n{len(names) - len(failures)}/{len(names)} green in {time.time() - t0:.0f}s at {sf_dir}")
    for name, msg in failures:
        print(f"  FAIL {name}: {msg[:400]}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
