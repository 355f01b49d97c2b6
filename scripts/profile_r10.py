"""Round-10 optimization profiler: per-query job/stage/task counts.

For each named query, runs one warm pass (sf0.001, untimed) then one
timed pass at the target SF inside its own job group, and reads the
group's job/stage/task counts from the status tracker — fast JVM
calls, no REST. Wall time attribution: a query whose wall is many
jobs x small tasks is driver/commit-machinery bound; one whose tasks
dominate is compute bound.

Usage: python scripts/profile_r10.py [sf_dir] [name ...]
Appends one JSON line per query to /tmp/profile_r10.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    spark = get_spark("profile-r10")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()

    all_q = q.spark_queries()
    if not names:
        names = list(all_q)
    out_path = "/tmp/profile_r10.jsonl"
    for name in names:
        fn = all_q[name]
        try:
            fn(spark, "/root/testdata/sf0.001").count()
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}", flush=True)
            continue
        spark.catalog.clearCache()
        group = f"prof_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        stage_ids = set()
        for jid in job_ids:
            ji = tracker.getJobInfo(jid)
            if ji:
                stage_ids.update(ji.stageIds)
        for sid in stage_ids:
            si = tracker.getStageInfo(sid)
            if si:
                n_stages += 1
                n_tasks += si.numTasks
        rec = {
            "name": name,
            "wall_s": round(wall, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(
            f"{wall:7.2f}s  jobs={len(job_ids):4d} stages={n_stages:4d} "
            f"tasks={n_tasks:6d}  {name}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
