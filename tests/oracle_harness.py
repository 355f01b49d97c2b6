"""Local mirror of the driver's DuckDB-oracle comparison: run each
registered Spark query and its oracle SQL on the same parquet, compare
row count, column names, and order-insensitive normalized values."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from multi_source_data_lake_with_etl_pipeline_spark.catalog import TPCH_TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'")
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, _dt.timedelta):
        return f"td:{v.total_seconds()}"
    return str(v)


def normalize_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize values, sort rows — the driver's
    order-insensitive compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare_query(spark, sf_dir: str, fn, oracle: str) -> tuple[bool, str]:
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb_con(sf_dir)
    res = con.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    con.close()
    if sorted(scols) != sorted(ocols):
        return False, f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
    if len(srows) != len(orows):
        return False, f"row count differs: spark={len(srows)} oracle={len(orows)}"
    ns, no = normalize_rows(scols, srows), normalize_rows(ocols, orows)
    if ns != no:
        diffs = [(a, b) for a, b in zip(ns, no) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, f"ok ({len(srows)} rows)"
