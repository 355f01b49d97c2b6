"""Round-11 driver-gap attribution: cProfile ONE query's timed run.

The r10 dissect showed audit wall ~= 50% inter-job driver gaps. This
script answers WHAT the driver is doing in those gaps: py4j waiting on
the JVM (Catalyst analysis / job scheduling), commit-log JSON replay,
pyarrow footer stats, os-level file I/O, or pure Python query-building.

Runs the query once warm (sf0.001) then cProfiles one timed run at the
target SF and prints a bucketed summary + the top-40 cumulative rows.

Usage: python scripts/gapprof_r11.py <query> [sf_dir]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

BUCKETS = {
    "py4j_socket_wait": ("socket", "recv_into"),
    "py4j_send": ("java_gateway", "send_command"),
    "json_load": ("json", "loads"),
    "pyarrow_footer": ("parquet", "read_metadata"),
    "os_stat": ("posix", "stat"),
    "os_listdir": ("posix", "listdir"),
    "os_rename": ("posix", "rename"),
}


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("gapprof-r11")
    spark.sparkContext.setLogLevel("ERROR")

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()
    fn = q.spark_queries()[name]
    fn(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()

    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    fn(spark, sf_dir).count()
    pr.disable()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()

    st = pstats.Stats(pr)
    total_tt = sum(v[2] for v in st.stats.values())
    rows = []
    for (fname, lno, func), (cc, nc, tt, ct, callers) in st.stats.items():
        rows.append((ct, tt, nc, f"{os.path.basename(fname)}:{lno}:{func}"))
    rows.sort(reverse=True)
    print(f"query={name} wall={wall:.3f}s profiled_tottime_sum={total_tt:.3f}s")
    # bucket tottime by module/function keywords
    buckets: dict[str, float] = {}
    for (fname, lno, func), (cc, nc, tt, ct, callers) in st.stats.items():
        key = f"{fname}:{func}"
        if "py4j" in fname and func == "send_command":
            buckets["py4j send_command (JVM wait, cumulative)"] = max(
                buckets.get("py4j send_command (JVM wait, cumulative)", 0), ct
            )
        if func == "recv_into" or (func == "readinto" and "socket" in fname):
            buckets["socket recv tottime"] = buckets.get("socket recv tottime", 0) + tt
        if func == "loads" and "json" in fname:
            buckets["json.loads tottime+cum"] = buckets.get("json.loads tottime+cum", 0) + ct
        if "lake.py" in fname and func in ("_replay", "_read_commit", "_versions", "props", "_checkpoint_at_or_before"):
            buckets[f"lake.{func} cum"] = buckets.get(f"lake.{func} cum", 0) + ct
        if "catalog.py" in fname and func == "load_table":
            buckets["catalog.load_table cum"] = buckets.get("catalog.load_table cum", 0) + ct
        if func == "read_metadata" or ("parquet" in fname and func == "metadata"):
            buckets["pyarrow footer cum"] = buckets.get("pyarrow footer cum", 0) + ct
        if "lake.py" in fname and func == "_file_stats":
            buckets["lake._file_stats cum"] = buckets.get("lake._file_stats cum", 0) + ct
        if "lake.py" in fname and func == "_write_files":
            buckets["lake._write_files cum"] = buckets.get("lake._write_files cum", 0) + ct
        if func in ("rename", "replace", "listdir", "stat", "rmtree") and (
            "posix" in str(fname) or "<built-in>" in str(fname) or "shutil" in fname
        ):
            buckets[f"os.{func} tot"] = buckets.get(f"os.{func} tot", 0) + tt
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {k:48s} {v:8.3f}s")
    print("top cumulative:")
    for ct, tt, nc, where in rows[:40]:
        print(f"  ct={ct:7.3f} tt={tt:7.3f} n={nc:>8} {where}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
