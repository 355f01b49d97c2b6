"""SCALE probe: verify_integrity() at ~5k files (VERDICT r7 item 7).

Builds a lake table with ~5000 active data files plus a 60-version
history (so the orphan scan has a real replay to do), then times:

- FSCK with the parallel footer pool (the shipped path)
- FSCK restricted to 1 worker (the old serial driver loop's shape)
- FSCK as a DISTRIBUTED Spark job (round 9: mapInPandas over the file
  specs — parallel worker PROCESSES, the 100k-file cluster path)
- the orphan scan's single forward log replay (included in all)

Run on a quiet machine: ``python scripts/scale_probe_fsck.py``.
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
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("fsck_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="fsck_probe_")
    try:
        n_files = 5000
        df = (
            spark.range(0, n_files * 10, 1, n_files)
            .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
        )
        t0 = time.time()
        t = LakeTable.create(spark, os.path.join(root, "t"), df)
        build_create = time.time() - t0
        # history depth for the orphan scan's forward replay
        for i in range(60):
            t.append(
                spark.createDataFrame([(10_000_000 + i, 1)], "k long, v long")
            )
        t.delete("k = 5", dv=True)
        nf = len(t._snapshot()[1])

        # alternating A/B/C: serial loop vs thread pool vs Spark job
        ser, par, dist = [], [], []
        r = None
        for _ in range(3):
            t0 = time.time()
            r = t.verify_integrity()
            ser.append(round(time.time() - t0, 2))
            t0 = time.time()
            r2 = t.verify_integrity(io_threads=32)
            par.append(round(time.time() - t0, 2))
            t0 = time.time()
            r3 = t.verify_integrity(distributed=True)
            dist.append(round(time.time() - t0, 2))
            assert r == r2 and r["ok"], "semantics changed between modes"
            assert {k: sorted(v) if isinstance(v, list) else v for k, v in r.items()} == {
                k: sorted(v) if isinstance(v, list) else v for k, v in r3.items()
            }, "distributed semantics diverged"

        print(
            json.dumps(
                {
                    "probe": "fsck_5k_files",
                    "active_files": nf,
                    "versions": t.latest_version() + 1,
                    "build_create_s": round(build_create, 2),
                    "fsck_serial_default_s": ser,
                    "fsck_io_threads_32_s": par,
                    "fsck_distributed_s": dist,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
