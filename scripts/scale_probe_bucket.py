"""SCALE probe: bucket-transform point lookups (round 9).

2M rows bucketed 64 ways (bucket_by -> generated pmod(xxhash64(k), N)
partition column, optimized writes): compares a full-scan point lookup
against read_where_eq's bucket-derived pruned lookup — files touched
and wall clock. The uuid-shaped-id counterpart of the r8 bloom probe,
with zero index maintenance. Run on a quiet machine.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .appName("bucket_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bucket_probe_")
    try:
        rows, nb = 20_000_000, 64
        df = spark.range(0, rows, 1, 32).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        t0 = time.time()
        t = LakeTable.create(
            spark, os.path.join(root, "t"), df,
            bucket_by=("k", nb), optimized_write=True,
        )
        built = time.time() - t0
        nf = t.details()["num_files"]

        def timed(fn, n=3):
            times = []
            for _ in range(n):
                t0 = time.time()
                fn()
                times.append(time.time() - t0)
            return round(sorted(times)[1], 3)

        probe = 12_345_678
        full = timed(
            lambda: t.read().filter(F.col("k") == probe).collect()
        )
        lookup = t.read_where_eq("k", probe)
        touched = len(lookup.inputFiles())
        pruned = timed(lambda: t.read_where_eq("k", probe).collect())
        assert [r["v"] for r in lookup.collect()] == [probe * 3]
        print(
            json.dumps(
                {
                    "probe": "bucket_point_lookup_64",
                    "rows": rows,
                    "buckets": nb,
                    "files": nf,
                    "build_s": round(built, 1),
                    "full_scan_lookup_s": full,
                    "bucket_lookup_s": pruned,
                    "files_touched": touched,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
