"""Lake table maintenance: small-file compaction, sort-based
clustering, stale-artifact vacuum.

A continuously-ingested parquet lake degrades in two ways the write
path cannot avoid: micro-batches and partition-pruned MERGEs leave
many small files (each costing a scan task + footer read), and
insertion order scatters values so parquet row-group min/max stats
stop pruning anything. These are the offline maintenance passes —
the no-Delta equivalents of OPTIMIZE / OPTIMIZE ZORDER / VACUUM:

- ``compact_table``: rewrite to ~``target_file_mb`` files.
- ``cluster_table``: range-repartition + sort on chosen columns, so
  each output file owns a tight, near-disjoint value range and
  min/max data skipping works again for predicates on those columns.
- ``vacuum_table``: remove crash leftovers of the copy-on-write
  writers (``<table>.old`` aside copies, orphaned ``merge_*``/
  ``del_*`` temp dirs). Run only when no writer is active.

All rewrites go through the same aside-swap as MERGE (never a moment
with no table on disk). Reference parity: the reference has no
maintenance layer at all (its loaders append forever) — this is part
of what running the same pipelines at 100 TB actually requires.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import _swap_table_dir


def _parquet_files(table_path: str) -> list[str]:
    return [
        p
        for p in glob.glob(os.path.join(table_path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(p)
    ]


def _dir_bytes(table_path: str) -> int:
    return sum(os.path.getsize(p) for p in _parquet_files(table_path))


def compact_table(
    spark: SparkSession,
    table_path: str,
    target_file_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """Rewrite the table into ~``target_file_mb``-sized files.

    File count = ceil(current_bytes / target). With ``partition_col``
    the layout is preserved (one coalesced write per partition value
    via partitionBy); compaction never changes row content — asserted
    cheaply by row-count equality before the swap.
    """
    files_before = len(_parquet_files(table_path))
    n_files = max(1, -(-_dir_bytes(table_path) // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(table_path)
    n_rows = df.count()
    tmp = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(table_path) or ".")
    writer = df.repartition(int(n_files)).write.mode("overwrite")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    writer.parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError("compaction row-count mismatch; table untouched")
    _swap_table_dir(table_path, tmp)
    return {"files_before": files_before, "files_after": len(_parquet_files(table_path))}


def cluster_table(
    spark: SparkSession,
    table_path: str,
    cluster_cols: list[str],
    n_files: int | None = None,
) -> dict:
    """Sort-cluster the table on ``cluster_cols``: range-repartition
    (each output file owns a contiguous value range) + sort within
    partitions (tight row-group stats inside each file). After this,
    a filter on the leading cluster column prunes at BOTH granularities
    parquet offers — files via footer min/max, row groups via
    statistics — without any table-format metadata. The single range
    exchange samples the column to build balanced bounds (Spark's
    RangePartitioner), so skew in the cluster key does not produce
    skewed files.
    """
    df = spark.read.parquet(table_path)
    n_rows = df.count()
    cols = [F.col(c) for c in cluster_cols]
    n_files = int(n_files or max(1, -(-_dir_bytes(table_path) // (128 * 1024 * 1024))))
    tmp = tempfile.mkdtemp(prefix="cluster_", dir=os.path.dirname(table_path) or ".")
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    if spark.read.parquet(tmp).count() != n_rows:
        shutil.rmtree(tmp)
        raise RuntimeError("clustering row-count mismatch; table untouched")
    _swap_table_dir(table_path, tmp)
    return {"n_files": len(_parquet_files(table_path)), "cluster_cols": cluster_cols}


def vacuum_table(table_path: str) -> list[str]:
    """Remove crash leftovers around ``table_path``: the ``.old``
    aside copy and orphaned writer temp dirs (``merge_*``, ``del_*``,
    ``compact_*``, ``cluster_*`` in the table's parent). Returns the
    removed paths. Only safe when no writer is active on this table —
    the writers themselves clean up on success, so anything matching
    here is debris from a crash."""
    removed: list[str] = []
    parent = os.path.dirname(os.path.abspath(table_path)) or "."
    candidates = [table_path + ".old"] + [
        os.path.join(parent, d)
        for d in os.listdir(parent)
        if d.startswith(("merge_", "del_", "compact_", "cluster_"))
    ]
    for p in candidates:
        if os.path.isdir(p):
            shutil.rmtree(p)
            removed.append(p)
    return removed
