"""SCALE probe: optimized writes at 200 partitions (round 9).

The r8 probe showed the classic small-file explosion: a 32-task write
into 200 hive dirs lands tasks x dirs = 6,400 files. This probe builds
the SAME table twice — default vs optimized_write=True (repartition by
the partition columns before the write, Delta
autoOptimize.optimizeWrite parity) — and compares file counts, build
time, and the full-read time over each layout. Run on a quiet machine.
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
        .appName("optwrite_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="optwrite_probe_")
    try:
        n_parts, rows = 200, 2_000_000

        def batch(lo, hi):
            return spark.range(lo, hi, 1, 32).select(
                F.col("id").alias("k"),
                (F.col("id") % n_parts).cast("long").alias("p"),
                (F.col("id") * 3).alias("v"),
            )

        out = {"probe": "optimized_write_200", "partitions": n_parts, "rows": rows}
        for label, opt in (("default", False), ("optimized", True)):
            t0 = time.time()
            t = LakeTable.create(
                spark, os.path.join(root, label), batch(0, rows),
                partition_by=["p"], optimized_write=opt,
            )
            t.append(batch(rows, rows + rows // 4))  # prop honored downstream
            built = time.time() - t0
            t0 = time.time()
            total = t.read().agg(F.sum("v")).collect()[0][0]
            read_s = time.time() - t0
            out[label] = {
                "files": t.details()["num_files"],
                "build_s": round(built, 1),
                "full_read_s": round(read_s, 2),
                "sum_v": int(total),
            }
        assert out["default"]["sum_v"] == out["optimized"]["sum_v"]
        print(json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
