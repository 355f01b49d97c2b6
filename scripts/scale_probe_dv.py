"""Deletion-vector probe: a SMALL delete on LARGE files — DV sidecar
vs copy-on-write rewrite (VERDICT r5 #6 'done' condition).

Builds a lake table from the full sf lineitem in a few big files,
deletes a handful of keys both ways, and reports wall time + bytes
written + read-back cost. The claim under test: DV write cost is
O(deleted rows) while rewrite is O(touched bytes), and the DV read
tax (one broadcast anti-join) is small.

Run: python scripts/scale_probe_dv.py [sf_dir]
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


def _dir_bytes(p: str) -> int:
    total = 0
    for root, _, files in os.walk(p):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dv-probe")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    keys = [r["l_orderkey"] for r in li.select("l_orderkey").distinct().limit(10).collect()]
    kdf = spark.createDataFrame([(k,) for k in keys], "l_orderkey long")
    print(f"corpus: {n} rows, deleting rows of {len(kdf.collect())} orderkeys")
    for mode, dv in (("rewrite", False), ("dv", True)):
        root = tempfile.mkdtemp(prefix=f"dvprobe_{mode}_")
        t = LakeTable.create(spark, root + "/t", li.repartition(4))
        base_bytes = _dir_bytes(t._data_dir)
        t0 = time.perf_counter()
        r = t.delete_keys(kdf, "l_orderkey", dv=dv)
        dt = time.perf_counter() - t0
        written = (
            _dir_bytes(t._data_dir)
            + (_dir_bytes(t._dv_dir) if os.path.isdir(t._dv_dir) else 0)
            - base_bytes
        )
        t1 = time.perf_counter()
        cnt = t.read().count()
        read_s = time.perf_counter() - t1
        print(
            f"{mode:8s} delete={r['deleted']:4d} rewritten_files="
            f"{r['rewritten_files']} wall={dt:6.2f}s bytes_written={written:>12,}"
            f" read_back={read_s:5.2f}s rows={cnt}"
        )
        shutil.rmtree(root, ignore_errors=True)
    # merge shape: 10-row upsert against orders (o_orderkey IS unique —
    # merge's documented precondition; lineitem keys are not)
    orders = load_table(spark, sf_dir, "orders")
    upd_keys = [
        r["o_orderkey"]
        for r in orders.select("o_orderkey").distinct().limit(10).collect()
    ]
    for mode, dv in (("rw-merge", False), ("dv-merge", True)):
        root = tempfile.mkdtemp(prefix=f"dvprobe_{mode}_")
        t = LakeTable.create(spark, root + "/t", orders.repartition(4))
        upd = orders.filter(F.col("o_orderkey").isin(upd_keys)).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        )
        base_bytes = _dir_bytes(root)
        t0 = time.perf_counter()
        r = t.merge(upd, "o_orderkey", dv=dv)
        dt = time.perf_counter() - t0
        written = _dir_bytes(root) - base_bytes
        t1 = time.perf_counter()
        cnt = t.read().count()
        read_s = time.perf_counter() - t1
        print(
            f"{mode:8s} updated={r['updated']:3d} rewritten_files="
            f"{r['rewritten_files']} wall={dt:6.2f}s bytes_written={written:>12,}"
            f" read_back={read_s:5.2f}s rows={cnt}"
        )
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def tax_growth() -> None:
    """Read-tax growth under stacked DVs: N successive small dv
    deletes, read cost after each, then compaction folding."""
    import tempfile as _tf

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dv-probe-tax")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, sf_dir, "lineitem")
    root = _tf.mkdtemp(prefix="dvprobe_tax_")
    t = LakeTable.create(spark, root + "/t", li.repartition(4))
    keys = [r["l_orderkey"] for r in li.select("l_orderkey").distinct().limit(100).collect()]
    print("stacked dv deletes (10 keys each):")
    for i in range(10):
        batch = spark.createDataFrame([(k,) for k in keys[i * 10 : (i + 1) * 10]], "l_orderkey long")
        t.delete_keys(batch, "l_orderkey", dv=True)
        t0 = time.perf_counter()
        n = t.read().count()
        dt = time.perf_counter() - t0
        ndv = len(os.listdir(t._dv_dir))
        if i in (0, 4, 9):
            print(f"  after {i+1:2d} deletes: read={dt:5.2f}s rows={n} sidecars={ndv}")
    t0 = time.perf_counter()
    t.compact(target_files=4)
    dt = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = t.read().count()
    rt = time.perf_counter() - t0
    print(f"  compact({dt:.2f}s) folds all vectors: read={rt:5.2f}s rows={n}")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    if os.environ.get("DV_PROBE_TAX"):
        tax_growth()
    else:
        main()
