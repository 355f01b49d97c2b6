"""End-to-end parity with the reference's Airflow DAG
(`multi_source_ingestion_dag.py`, SURVEY.md §3.3): 3 parallel source
extracts → provenance stamping → schema-drift union → clean + validate
+ enrich → content-based zone routing → quality report.

The reference relays staging JSON files between 4 worker processes;
here the whole lifecycle is DataFrame transformations and the report
is a real aggregation instead of hardcoded numbers
(multi_source_ingestion_dag.py:331-346).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.operators.cleaning import clean
from multi_source_data_lake_with_etl_pipeline_spark.operators.enrichment import (
    add_provenance,
    enrich,
)
from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import quality_report
from multi_source_data_lake_with_etl_pipeline_spark.operators.validation import (
    FieldRule,
    validate,
)
from multi_source_data_lake_with_etl_pipeline_spark.sinks.routing import (
    LoaderManager,
    route_by_content,
)
from multi_source_data_lake_with_etl_pipeline_spark.sources.registry import (
    ExtractorRegistry,
)

from .conftest import SF_SMOKE


def test_dag_equivalent_pipeline(spark, tmp_path):
    reg = ExtractorRegistry()

    # -- extract (3 sources, provenance-stamped: DAG lines 65-66/99-100)
    sources = {}
    for src, table in [("users", "customer"), ("orders", "orders"), ("events", "events")]:
        df = reg.extract(spark, "parquet_table", sf_dir=SF_SMOKE, table=table)
        sources[src] = add_provenance(df, src)

    # -- union (D5 schema-drift-tolerant: DAG staging-file concat 171-186)
    unioned = sources["users"]
    for name in ("orders", "events"):
        unioned = unioned.unionByName(sources[name], allowMissingColumns=True)
    total = unioned.count()
    assert total == sum(df.count() for df in sources.values())

    # -- transform: clean → validate (flags kept, not dropped) → enrich
    transformed = enrich(
        validate(
            clean(unioned),
            [
                FieldRule("o_totalprice", min=0),
                FieldRule("c_acctbal", max=1e9),
            ],
        )
    )
    assert transformed.count() == total  # V1: nothing dropped
    for col in ("_validation_errors", "_is_valid", "_record_hash", "_cleaned_at"):
        assert col in transformed.columns

    # -- load: content routing (L9) through the loader manager (L8)
    zones = {src: route_by_content(src) for src in sources}
    assert zones["orders"] == ["structured", "archive"]
    assert zones["events"] == ["semi_structured", "archive"]
    assert zones["users"] == ["structured", "semi_structured", "archive"]

    mgr = LoaderManager()
    for src in sources:
        part = transformed.filter(F.col("_source_table") == src)
        routing = {
            zone: {
                "type": "file",
                "params": {
                    "path": str(tmp_path / zone / src),
                    "file_format": "parquet",
                },
            }
            for zone in zones[src]
        }
        results = mgr.route_and_load(part, routing)
        assert all(r["status"] == "success" for r in results.values())

    # archive zone always receives every source (DAG 298-305)
    archived = spark.read.parquet(str(tmp_path / "archive" / "*"))
    assert archived.count() == total
    stats = mgr.get_stats()
    assert stats["failed"] == 0 and stats["total_loads"] == 7

    # -- report: real aggregation, not the DAG's hardcoded 0.95
    report = quality_report(transformed.drop("_validation_errors"))
    assert report["metrics"]["total_records"] == total
    # schema-drift union ⇒ per-source columns are mostly null
    assert report["metrics"]["null_percentages"]["o_totalprice"] > 0.3
    assert any("null values" in w for w in report["warnings"])


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        body = json.dumps(
            {"results": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):
        pass


def test_rest_api_extract_envelope_unwrap(spark):
    server = HTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        reg = ExtractorRegistry()
        df = reg.extract(
            spark, "rest_api", url=f"http://127.0.0.1:{server.server_port}/api"
        )
        rows = {r["id"]: r["name"] for r in df.collect()}
        assert rows == {1: "a", 2: "b"}  # S6 envelope unwrap (results key)
    finally:
        server.shutdown()


class TestDagScheduler:
    """plans/scheduler.py vs the reference DAG's lifecycle semantics
    (airflow/dags/multi_source_ingestion_dag.py:29-397)."""

    def _mk(self, tid, log, fn=None, **kw):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import Task

        def body(results):
            log.append(tid)
            return fn(results) if fn else tid

        return Task(tid, body, **kw)

    def test_topological_order_and_xcom_passing(self):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import run_dag

        log = []
        tasks = [
            self._mk("load", log, lambda r: r["transform"] + "+loaded",
                     upstream=("transform",)),
            self._mk("extract_a", log),
            self._mk("extract_b", log),
            self._mk("transform", log,
                     lambda r: r["extract_a"] + "|" + r["extract_b"],
                     upstream=("extract_a", "extract_b")),
        ]
        run = run_dag(tasks)
        assert run.ok
        assert log.index("transform") > max(log.index("extract_a"), log.index("extract_b"))
        assert log.index("load") > log.index("transform")
        assert run.results["load"] == "extract_a|extract_b+loaded"

    def test_retries_then_success_with_delay(self):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import (
            Task,
            run_dag,
        )

        calls, delays = [], []

        def flaky(results):
            calls.append(1)
            if len(calls) < 3:
                raise RuntimeError("transient")
            return "ok"

        run = run_dag(
            [Task("flaky", flaky, retries=3, retry_delay_s=5.0)],
            sleep=delays.append,
        )
        assert run.ok and run.attempts["flaky"] == 3 and delays == [5.0, 5.0]

    def test_failure_marks_downstream_and_spares_siblings(self):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import (
            Task,
            run_dag,
        )

        def boom(results):
            raise ValueError("no source")

        log = []
        run = run_dag(
            [
                Task("bad", boom, retries=1),
                self._mk("good", log),
                self._mk("joined", log, upstream=("bad", "good")),
                self._mk("tail", log, upstream=("joined",)),
            ]
        )
        assert run.states == {
            "bad": "failed",
            "good": "success",
            "joined": "upstream_failed",
            "tail": "upstream_failed",
        }
        assert run.attempts["bad"] == 2 and "ValueError" in run.errors["bad"]
        assert not run.ok

    def test_cycle_and_unknown_upstream_rejected(self):
        import pytest

        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import (
            Task,
            topological_order,
        )

        a = Task("a", lambda r: 1, upstream=("b",))
        b = Task("b", lambda r: 1, upstream=("a",))
        with pytest.raises(ValueError, match="cycle"):
            topological_order([a, b])
        with pytest.raises(ValueError, match="unknown task"):
            topological_order([Task("x", lambda r: 1, upstream=("ghost",))])

    def test_reference_shaped_dag_on_dataframes(self, spark, tmp_path):
        """extracts -> transform_validate -> load -> quality_report as
        ONE lazy composite plan; only load/report materialize."""
        from multi_source_data_lake_with_etl_pipeline_spark.operators.validation import (
            FieldRule,
            validate,
        )
        from multi_source_data_lake_with_etl_pipeline_spark.plans.scheduler import (
            Task,
            run_dag,
        )

        out = str(tmp_path / "lake_out")

        def ex_a(r):
            return spark.range(0, 50).select(
                F.col("id"), F.lit("pg").alias("src")
            )

        def ex_b(r):
            return spark.range(50, 80).select(
                F.col("id"), F.lit("mongo").alias("src")
            )

        def transform(r):
            df = r["extract_pg"].unionByName(r["extract_mongo"])
            return validate(df, [FieldRule("id", required=True, min=0)])

        def load(r):
            r["transform_validate"].write.mode("overwrite").parquet(out)
            return out

        def report(r):
            df = spark.read.parquet(r["load"])
            return df.groupBy("src").count().collect()

        run = run_dag(
            [
                Task("extract_pg", ex_a),
                Task("extract_mongo", ex_b),
                Task("transform_validate", transform,
                     upstream=("extract_pg", "extract_mongo")),
                Task("load", load, upstream=("transform_validate",), retries=1),
                Task("quality_report", report, upstream=("load",)),
            ]
        )
        assert run.ok
        assert {r["src"]: r["count"] for r in run.results["quality_report"]} == {
            "pg": 50,
            "mongo": 30,
        }
