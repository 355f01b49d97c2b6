"""SCALE probe: partition pruning at 200 partitions (round 8).

Builds a 200-partition hive-layout lake table (2M rows), then
measures: full-table read vs a one-partition pruned read (wall clock
+ files listed), a partition-scoped replace_where, and a
partition-scoped DELETE — all of which must touch O(partition), not
O(table). Run on a quiet machine.
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
        .appName("part_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="part_probe_")
    try:
        n_parts, rows = 200, 2_000_000
        df = spark.range(0, rows, 1, 32).select(
            F.col("id").alias("k"),
            (F.col("id") % n_parts).cast("long").alias("p"),
            (F.col("id") * 3).alias("v"),
        )
        t0 = time.time()
        t = LakeTable.create(
            spark, os.path.join(root, "t"), df, partition_by=["p"]
        )
        built = time.time() - t0
        nf = len(t._snapshot()[1])

        def timed(fn, n=3):
            best = []
            for _ in range(n):
                t0 = time.time()
                fn()
                best.append(time.time() - t0)
            return round(sorted(best)[1], 3)

        full = timed(lambda: t.read().agg(F.sum("v")).collect())
        pruned_files = len(t.files_overlapping("p", 7, 7))
        pruned = timed(
            lambda: t.read_pruned("p", 7, 7).agg(F.sum("v")).collect()
        )
        t0 = time.time()
        t.replace_where(
            spark.range(0, rows // n_parts).select(
                (F.col("id") * n_parts + 7).alias("k"),
                F.lit(7).cast("long").alias("p"),
                F.lit(0).cast("long").alias("v"),
            ),
            "p = 7",
        )
        rw = time.time() - t0
        t0 = time.time()
        d = t.delete("p = 13")
        dl = time.time() - t0
        print(
            json.dumps(
                {
                    "probe": "partition_prune_200",
                    "partitions": n_parts,
                    "rows": rows,
                    "files": nf,
                    "build_s": round(built, 1),
                    "full_read_s": full,
                    "pruned_read_s": pruned,
                    "pruned_files_listed": pruned_files,
                    "replace_where_s": round(rw, 2),
                    "delete_partition_s": round(dl, 2),
                    "deleted_rows": d["deleted"],
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
