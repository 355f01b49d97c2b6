"""Lake-table catalog: parquet dirs → DataFrames / temp views.

Replaces the reference's three-engine federation (Postgres
``information_schema`` introspection at
``src/connectors/postgres_connector.py:127-145``, Mongo
``list_collection_names`` at ``src/connectors/mongo_connector.py:205-212``,
Influx schema functions at ``src/connectors/influx_connector.py:229-272``)
with the Spark catalog: every zone table is a temp view, so the full
SQL surface (the reference's S7 raw-SQL passthrough,
``postgres_connector.py:87-97``) is served by ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# File-identity-keyed METADATA caches (guide §6: table formats keep
# schema/manifest metadata so readers stop re-reading file footers on
# every scan — the same ~50-80 ms of driver work was being paid per
# load_table call here: one pyarrow footer sniff + one Spark schema
# inference). Keys carry (path, size, mtime), so a rewritten input
# invalidates naturally. Only SCHEMAS are cached — pure metadata;
# every query still scans the parquet bytes, nothing result-shaped is
# memoized.
_NANOS_CACHE: dict[tuple, list[str]] = {}
_SCHEMA_CACHE: dict[tuple, object] = {}


def _stat_key(path: str) -> tuple | None:
    """Identity of a parquet input for the metadata caches.

    Files: (path, size, mtime_ns) — nanosecond mtime, so an in-place
    rewrite within 1 s on a coarse filesystem still changes the key.
    Directory datasets: the root stat does NOT change when a file
    inside a (possibly nested/partitioned) subdir is rewritten, so the
    key folds in every contained data file's (relpath, size, mtime_ns)
    — any rewrite, addition or removal anywhere under the root yields
    a new key and the stale schema can never be served."""
    try:
        st = os.stat(path)
    except OSError:
        return None
    if not os.path.isdir(path):
        return (path, st.st_size, st.st_mtime_ns)
    files: list[tuple] = []
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue  # _SUCCESS / hidden markers carry no schema
            try:
                fst = os.stat(os.path.join(dirpath, n))
            except OSError:
                continue
            files.append(
                (os.path.relpath(os.path.join(dirpath, n), path),
                 fst.st_size, fst.st_mtime_ns)
            )
    return (path, st.st_mtime_ns, tuple(sorted(files)))


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. Footer-sniffed via pyarrow (cached per
    file identity)."""
    key = _stat_key(path)
    if key is not None and key in _NANOS_CACHE:
        return _NANOS_CACHE[key]
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        out = [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        out = []
    if key is not None:
        _NANOS_CACHE[key] = out
    return out


SILVER_DIR = os.environ.get("SPARK_GRAFT_SILVER_DIR", "/tmp/mdl_silver")


def _read_nanos_converted(spark: SparkSession, path: str, nanos: list[str]) -> DataFrame:
    """Raw (bronze) read of a TIMESTAMP(NANOS) parquet: epoch-nanos
    longs truncated to microsecond timestamps — integer division,
    matching DuckDB's nanos→micros truncation."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def silver_path(spark: SparkSession, sf_dir: str, name: str) -> str | None:
    """Path of the normalized (silver) copy of a table whose raw
    parquet Spark cannot scan efficiently; None if the raw file is
    already directly scannable.

    The raw events parquet stores TIMESTAMP(NANOS): Spark's reader
    only takes it as a long column, and converting long→timestamp in
    the plan makes every time predicate un-pushable — a full scan per
    query at 100 TB. The medallion fix is a ONE-TIME bronze→silver
    normalization (nanos → native micros timestamps, rows clustered by
    time), after which every downstream query gets parquet predicate
    pushdown + row-group pruning on the time axis for free. Staging is
    atomic (tmp + rename) and keyed on the source file's identity, so
    concurrent sessions and changed inputs are safe.
    """
    path = table_path(sf_dir, name)
    nanos = _nanos_timestamp_cols(path)
    if not nanos:
        return None
    st = os.stat(path)
    key = f"{name}-{st.st_size}-{int(st.st_mtime)}"
    dest = os.path.join(SILVER_DIR, key)
    if not os.path.exists(dest):
        tmp = f"{dest}.tmp-{os.getpid()}"
        df = _read_nanos_converted(spark, path, nanos)
        # Cluster by the leading timestamp column: row-group min/max
        # stats then prune time-range scans.
        df.sortWithinPartitions(nanos[0]).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, dest)
        except OSError:  # lost a concurrent staging race — theirs is fine
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return dest


def streamable_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Directory the file-stream source should watch for *name*: the
    silver copy when the raw parquet needs normalization, else the raw
    path (e.g. when the lake already stores native-micros timestamps).

    Spark's file-stream source requires a *directory* (``basePath``
    must be a directory); a lake table that is one bare parquet file is
    exposed through a directory holding a symlink to it — zero data
    copy, and the identity key (size+mtime) invalidates the link dir
    if the source file changes."""
    silver = silver_path(spark, sf_dir, name)
    if silver:
        return silver
    raw = table_path(sf_dir, name)
    if os.path.isdir(raw):
        return raw
    st = os.stat(raw)
    dest = os.path.join(SILVER_DIR, f"{name}-streamdir-{st.st_size}-{int(st.st_mtime)}")
    if not os.path.exists(dest):
        tmp = f"{dest}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        os.symlink(raw, os.path.join(tmp, os.path.basename(raw)))
        try:
            os.rename(tmp, dest)
        except OSError:  # lost a concurrent race — theirs is fine
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return dest


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table. Plain ``spark.read.parquet`` so Catalyst
    gets full predicate pushdown + column pruning on the scan; tables
    with un-scannable raw types are served from their silver copy
    (see ``silver_path``). The parquet schema is cached per file
    identity (size+mtime) and pinned on repeat reads — skipping
    Spark's footer-inference round per call, the manifest-metadata
    idea of guide §6 applied to the session catalog; the scan itself
    is unchanged (same schema bytes the footer would yield)."""
    silver = silver_path(spark, sf_dir, name)
    p = silver or table_path(sf_dir, name)
    key = _stat_key(p)
    cached = _SCHEMA_CACHE.get(key) if key is not None else None
    if cached is not None:
        return spark.read.schema(cached).parquet(p)
    df = spark.read.parquet(p)
    if key is not None:
        _SCHEMA_CACHE[key] = df.schema
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names if os.path.exists(table_path(sf_dir, n))}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Register every table as a temp view → enables ``spark.sql``
    passthrough (reference S7) over the whole lake."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs


def list_tables(sf_dir: str) -> list[str]:
    """Catalog introspection analog of the reference's table/collection
    listing endpoints (``src/api/main.py`` sources listing)."""
    return sorted(
        f[: -len(".parquet")] for f in os.listdir(sf_dir) if f.endswith(".parquet")
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Raw SQL passthrough (reference S7 ``execute_query``,
    ``postgres_connector.py:87-97``) — here Catalyst parses, optimizes
    and executes instead of forwarding a string to an external engine."""
    return spark.sql(query)


def register_lake_table(
    spark: SparkSession, path: str, view_name: str, version: int | None = None
) -> DataFrame:
    """Expose a versioned ``lake.LakeTable`` snapshot to the SQL
    surface (S7): the snapshot's file list is resolved once at
    registration, so SQL readers get the same isolation guarantee as
    ``LakeTable.read`` — concurrent commits never shift a registered
    view. Re-register to advance to a newer version."""
    from .lake import LakeTable

    df = LakeTable.load(spark, path).read(version)
    df.createOrReplaceTempView(view_name)
    return df
