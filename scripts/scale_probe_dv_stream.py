"""Streaming-DV maintenance probe: a 50-batch CDC trickle in
deletion-vector mode, WITH vs WITHOUT in-loop maintenance
(``stream_merge_lake(maintain_every=10)``) — the round-7 'read tax
stays flat' claim (VERDICT r6 item 7).

Each micro-batch updates 20 existing orders keys (vectoring 20 rows
out of large files) and inserts 2 new keys. Without maintenance the
snapshot accumulates one sidecar + one small insert file per batch and
every reader pays a growing anti-join build + file-listing tax; with
``optimize_if_needed`` on a 10-batch cadence the backlog is folded as
fast as it forms. Read times are measured POST-HOC by time travel to
each checkpoint's merge commit — the same snapshot a live reader saw.

Run: python scripts/scale_probe_dv_stream.py [sf_dir]  (markdown rows)
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table
from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

N_BATCHES = 50
CADENCE = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dv-stream-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        stream_merge_lake,
    )

    o = load_table(spark, sf_dir, "orders")
    cols = o.columns
    print(f"corpus: {o.count()} orders rows; {N_BATCHES} CDC batches "
          f"(20 updates + 2 inserts each), cadence {CADENCE}")
    print("| batches | mode | active files | dv entries | backlog rows | read |")
    print("|---|---|---|---|---|---|")
    for mode, maintain in (("no-maint", 0), (f"maint@{CADENCE}", CADENCE)):
        root = tempfile.mkdtemp(prefix=f"dvstream_{mode}_")
        t = LakeTable.create(spark, root + "/t", o.repartition(4))
        src = os.path.join(root, "cdc")
        for b in range(N_BATCHES):
            upd = o.filter(
                F.col("o_orderkey").between(40 * b, 40 * b + 39)
            ).limit(20).withColumn("o_totalprice", F.lit(float(b)))
            ins = upd.limit(2).select(
                (F.lit(1_000_000 + b) + F.monotonically_increasing_id()).alias(
                    "o_orderkey"
                ),
                *[c for c in cols if c != "o_orderkey"],
            )
            upd.unionByName(ins).withColumn("seq", F.lit(b)).coalesce(
                1
            ).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(
                spark.read.parquet(src).schema
            ).option("maxFilesPerTrigger", 1).parquet(src)
        )
        t0 = time.perf_counter()
        stream_merge_lake(
            stream, root + "/t", "o_orderkey", root + "/ck",
            order_col="seq", dv=True, timeout_s=3600,
            maintain_every=maintain,
            maintenance=dict(
                small_file_bytes=8 << 20, min_small_files=8,
                max_dv_fraction=0.02,
            ),
        )
        wall = time.perf_counter() - t0
        # post-hoc read-tax trajectory: time travel to every CADENCE-th
        # merge commit (newest-first history → reverse for commit order)
        merges = [h["version"] for h in reversed(t.history()) if h["op"] == "merge"]
        for i in range(CADENCE - 1, N_BATCHES, CADENCE):
            v = merges[i]
            _, active, _ = t._snapshot(v)
            ndv = sum(1 for a in active if a.get("dv"))
            backlog = sum(int(a.get("dv", {}).get("ndel", 0)) for a in active)
            r0 = time.perf_counter()
            t.read(v).count()
            rt = time.perf_counter() - r0
            print(
                f"| {i + 1} | {mode} | {len(active)} | {ndv} | {backlog} "
                f"| {rt:.2f} s |"
            )
        print(f"({mode}: {N_BATCHES} batches in {wall:.1f} s total)")
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
