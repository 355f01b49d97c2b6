"""Serving tier: the reference's REST surface over the Spark engine.

Maps every endpoint of the reference API (``src/api/main.py:53-390``)
onto engine components, with the three database personas
(Postgres table / Mongo collection / Influx measurement) all served by
the one lake catalog:

- table query  (``main.py:154-176``)  → ``catalog.load_table`` +
  Catalyst-parsed WHERE + limit
- collection query (``main.py:178-197``) → Mongo filter-doc compiled to
  Column predicates (P2)
- measurement query (``main.py:199-221``) → ``timeseries.time_range``
  with Flux-style relative starts (``-1h``)
- ETL run (``main.py:224-280``) → ``plans.pipeline.run_job`` (ONE lazy
  plan; nothing materialized driver-side)
- upload (``main.py:282-304``) → ``createDataFrame`` + routed load
- health/metadata/stats (``main.py:307-390``) → catalog introspection

Scale posture: every read endpoint carries a mandatory row ``limit``
(default 100, like the reference) applied BEFORE collect, so the
serving tier never pulls more than a page through the driver; ETL jobs
execute cluster-side and the response carries only counts and stats.
``DataLakeService`` is HTTP-free so it can sit behind any transport
(the stdlib server in ``api.http``, tests call it directly).
"""

from __future__ import annotations

import base64
import datetime as _dt
import decimal
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog
from ..operators.timeseries import time_range
from ..plans.pipeline import ETLJob, TransformStep, build_plan
from ..sinks.routing import LoaderManager
from ..sources.registry import ExtractorRegistry

API_VERSION = "1.0.0"


def _jsonable(v):
    """Row values → JSON-safe (datetime/date → ISO, Decimal → float,
    bytes → base64, Row/array/map → containers)."""
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonable(x) for x in v]
    if hasattr(v, "asDict"):  # Row
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return v


def rows_to_records(df: DataFrame, limit: int) -> list[dict]:
    """limit-then-collect: the ONLY place the serving tier materializes
    data, and always bounded."""
    return [
        {k: _jsonable(v) for k, v in row.asDict().items()}
        for row in df.limit(int(limit)).collect()
    ]


# Mongo filter-document operators → Column predicate (P2; the reference
# forwards the dict verbatim to pymongo, mongo_connector.py:95-118).
_MONGO_OPS = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$in": lambda c, v: c.isin(list(v)),
}


def mongo_filter_to_column(filter_doc: dict) -> Column | None:
    """{"a": 1, "b": {"$gt": 2}} → (a = 1) AND (b > 2). Conjunction of
    field predicates, like a pymongo find filter."""
    pred = None
    for field, cond in filter_doc.items():
        col = F.col(field)
        if isinstance(cond, dict):
            for op, val in cond.items():
                if op not in _MONGO_OPS:
                    raise ValueError(f"unsupported filter operator {op!r}")
                term = _MONGO_OPS[op](col, val)
                pred = term if pred is None else pred & term
        else:
            term = col == cond
            pred = term if pred is None else pred & term
    return pred


_FLUX_UNIT = {"s": "second", "m": "minute", "h": "hour", "d": "day", "w": "week"}


def flux_relative(start: str) -> str | None:
    """Flux-style relative start ``-1h`` / ``-30m`` / ``-7d`` →
    Spark INTERVAL phrase (``influx_connector.py:142-162`` default
    ``start="-1h"``). Returns None if not relative."""
    m = re.fullmatch(r"-(\d+)([smhdw])", start.strip())
    if not m:
        return None
    return f"{m.group(1)} {_FLUX_UNIT[m.group(2)]}"


class DataLakeService:
    """One engine session serving the reference's API surface."""

    def __init__(
        self,
        spark: SparkSession,
        sf_dir: str,
        extractors: ExtractorRegistry | None = None,
        loaders: LoaderManager | None = None,
    ):
        self.spark = spark
        self.sf_dir = sf_dir
        self.extractors = extractors or ExtractorRegistry()
        self.loaders = loaders or LoaderManager()
        self._job_seq = 0

    # -- info endpoints (main.py:53-131) --------------------------------

    def root(self) -> dict:
        return {
            "message": "Multi-Source Data Lake API (Spark engine)",
            "version": API_VERSION,
            "status": "running",
            "environment": "spark",
        }

    def health(self) -> dict:
        return {
            "status": "healthy",
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "version": API_VERSION,
        }

    def status(self) -> dict:
        sc = self.spark.sparkContext
        return {
            "api": {"status": "running", "version": API_VERSION},
            "engine": {
                "spark_version": self.spark.version,
                "master": sc.master,
                "default_parallelism": sc.defaultParallelism,
                "aqe": self.spark.conf.get("spark.sql.adaptive.enabled", "false"),
            },
            "catalog": {"sf_dir": self.sf_dir, "tables": catalog.list_tables(self.sf_dir)},
        }

    def config(self) -> dict:
        return {
            "app_name": "multi_source_data_lake_with_etl_pipeline_spark",
            "data_paths": {"lake": self.sf_dir, "silver": catalog.SILVER_DIR},
            "etl_config": {
                "shuffle_partitions": self.spark.conf.get("spark.sql.shuffle.partitions"),
                "max_partition_bytes": self.spark.conf.get(
                    "spark.sql.files.maxPartitionBytes", "134217728b"
                ),
                "source_types": sorted(self.extractors._extractors),
            },
        }

    # -- query endpoints (main.py:154-221) ------------------------------

    def _table(self, name: str) -> DataFrame:
        if name not in catalog.list_tables(self.sf_dir):
            raise KeyError(f"unknown table {name!r}")
        return catalog.load_table(self.spark, self.sf_dir, name)

    def query_table(self, table: str, limit: int = 100, where: str | None = None) -> dict:
        """S1 persona: SELECT * FROM t [WHERE ...] LIMIT n. The WHERE
        string goes through Catalyst's parser → pushed to the scan."""
        df = self._table(table)
        if where:
            df = df.filter(F.expr(where))
        data = rows_to_records(df, limit)
        return {"status": "success", "data": data, "count": len(data), "table": table}

    def query_collection(
        self, collection: str, limit: int = 100, filter: dict | None = None
    ) -> dict:
        """S2 persona: Mongo find(filter, limit) over a lake table."""
        df = self._table(collection)
        pred = mongo_filter_to_column(filter) if filter else None
        if pred is not None:
            df = df.filter(pred)
        data = rows_to_records(df, limit)
        return {
            "status": "success",
            "data": data,
            "count": len(data),
            "collection": collection,
        }

    def query_measurement(
        self,
        measurement: str,
        start: str = "-1h",
        stop: str = "now()",
        fields: list[str] | None = None,
        ts_col: str = "ts",
        limit: int = 10000,
    ) -> dict:
        """S3 persona: Influx query_range(measurement, start, stop,
        fields). Relative Flux starts supported; absolute ISO
        timestamps otherwise. Time predicates push to row-group
        pruning on the ts-clustered silver copy."""
        df = self._table(measurement)
        rel = flux_relative(start) if isinstance(start, str) else None
        df = time_range(
            df,
            ts_col,
            start=None if rel else start,
            stop=None if stop in (None, "now()") else stop,
            relative=rel,
        )
        if fields:
            df = df.select(ts_col, *fields)
        data = rows_to_records(df, limit)
        return {
            "status": "success",
            "data": data,
            "count": len(data),
            "measurement": measurement,
            "time_range": f"{start} to {stop}",
        }

    # -- ETL endpoints (main.py:224-304) --------------------------------

    def run_etl(self, job_request: dict) -> dict:
        """ETLJobRequest (main.py:141-146): {source_type, source_config,
        target_type, target_config, transformations}. Compiles to one
        lazy plan; persist covers the count + load double-pass."""
        steps = tuple(
            TransformStep(**t) if isinstance(t, dict) else TransformStep(name=t)
            for t in job_request.get("transformations", [])
        )
        job = ETLJob(
            source_type=job_request["source_type"],
            source_config=job_request.get("source_config", {}),
            target_config={
                "target": {
                    "type": job_request.get("target_type", "file"),
                    "params": job_request.get("target_config", {}),
                }
            },
            transformations=steps,
        )
        df = build_plan(self.spark, job, self.extractors).persist()
        try:
            extracted_count = df.count()
            load_results = self.loaders.route_and_load(df, job.target_config)
        finally:
            df.unpersist()
        self._job_seq += 1
        ok = all(r["status"] == "success" for r in load_results.values())
        return {
            "status": "success" if ok else "partial",
            "job_id": f"job_{self._job_seq:06d}",
            "extracted_count": extracted_count,
            # main.py:275 returns per-transformer stats; in a lazy engine
            # the chain runs as one fused plan, so the honest stats are
            # the applied step list + the single plan's output count.
            "transformation_stats": {
                "applied": [s.name for s in steps],
                "output_rows": extracted_count,
            },
            "load_results": load_results,
        }

    def upload(self, data: list[dict], target_type: str, target_config: dict) -> dict:
        """main.py:282-304: records → DataFrame → routed load."""
        df = self.spark.createDataFrame(data)
        results = self.loaders.route_and_load(
            df, {"upload_target": {"type": target_type, "params": target_config}}
        )
        return {"status": "success", "uploaded_count": len(data), "results": results}

    # -- health / metadata / stats (main.py:307-390) --------------------

    def databases_health(self) -> dict:
        """Per-table readability probe — schema (footer) read only, no
        scan, so it stays O(tables) not O(data)."""
        health = {}
        for name in catalog.list_tables(self.sf_dir):
            try:
                n_cols = len(self._table(name).schema.fields)
                health[name] = {"status": "healthy", "columns": n_cols}
            except Exception as exc:  # pragma: no cover - broken file
                health[name] = {"status": "error", "error": str(exc)}
        ok = all(h["status"] == "healthy" for h in health.values())
        return {
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
            "overall_status": "healthy" if ok else "degraded",
            "databases": health,
        }

    def metadata_tables(self) -> dict:
        return {"tables": catalog.list_tables(self.sf_dir)}

    def metadata_collections(self) -> dict:
        # One lake catalog serves the Mongo persona too (SURVEY §4.3.4).
        return {"collections": catalog.list_tables(self.sf_dir)}

    def metadata_measurements(self) -> dict:
        """Measurement = lake table with a timestamp column (the Influx
        persona); schema sniff only."""
        out = []
        for name in catalog.list_tables(self.sf_dir):
            if any(
                f.dataType.typeName().startswith("timestamp")
                for f in self._table(name).schema.fields
            ):
                out.append(name)
        return {"measurements": out}

    def etl_stats(self) -> dict:
        return {
            "status": "success",
            "statistics": self.loaders.get_stats(),
            "timestamp": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }

    # -- lake endpoints (engine superset: versioned lake tables) --------

    def lake_history(self, path: str) -> dict:
        """Commit log of a versioned lake table (op/version/ts/file
        deltas, newest first)."""
        from ..lake import LakeTable

        t = LakeTable.load(self.spark, path)
        return {"status": "success", "path": path, "history": t.history()}

    def lake_query(
        self,
        path: str,
        version: int | None = None,
        limit: int = 100,
        where: str | None = None,
    ) -> dict:
        """Snapshot (or time-travel) read of a lake table with the same
        bounded limit-before-collect discipline as every read path."""
        from ..lake import LakeTable

        df = LakeTable.load(self.spark, path).read(version)
        if where:
            df = df.filter(F.expr(where))
        data = rows_to_records(df, limit)
        return {
            "status": "success",
            "data": data,
            "count": len(data),
            "path": path,
            "version": version,
        }
