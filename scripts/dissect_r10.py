"""Dissect ONE query: per-job wall time + call-site attribution.

Runs the query once warm then once timed with the UI on, and prints
every Spark job it launched (duration, description/call site, stages,
tasks) so commit-machinery overhead can be attributed line by line.

Usage: python scripts/dissect_r10.py <name> [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

UI_PORT = 4051


def _rest(app_id: str, path: str):
    url = f"http://localhost:{UI_PORT}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        "dissect-r10",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()
    fn = q.spark_queries()[name]
    fn(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    jobs_before = {j["jobId"] for j in _rest(app_id, "jobs")}
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    wall = time.perf_counter() - t0
    jobs = [j for j in _rest(app_id, "jobs") if j["jobId"] not in jobs_before]
    jobs.sort(key=lambda j: j["jobId"])
    total_job_ms = 0.0
    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    prev_end = None
    for j in jobs:
        dur = _ts(j["completionTime"]) - _ts(j["submissionTime"])
        gap = (_ts(j["submissionTime"]) - prev_end) if prev_end else 0.0
        prev_end = _ts(j["completionTime"])
        total_job_ms += dur
        desc = (j.get("description") or j.get("name") or "")[:95]
        print(
            f"job {j['jobId']:5d} {dur*1000:7.0f}ms gap{gap*1000:6.0f}ms "
            f"stages={j['numCompletedStages']:3d}+{j.get('numSkippedStages',0):2d}skip "
            f"tasks={j['numCompletedTasks']:5d}  {desc}"
        )
    print(
        f"\nwall {wall:.2f}s | {len(jobs)} jobs, sum(job durations) "
        f"{total_job_ms:.2f}s, driver gaps {wall - total_job_ms:.2f}s"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
