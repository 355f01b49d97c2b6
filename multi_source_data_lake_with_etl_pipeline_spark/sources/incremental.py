"""High-watermark incremental batch extraction (reference S9's
scheduled-batch pattern done Spark-first).

The reference's DAG re-extracts on a schedule; the standard way to make
that incremental is a persisted high watermark: each run reads only
rows with ``ts_col`` strictly greater than the last committed
watermark, then advances it. The predicate is a plain pushable filter,
so at 100 TB the scan prunes to the new partitions/row-groups — an
incremental run costs proportional to NEW data, not table size.

Commit protocol: read → process → ``commit_watermark`` LAST (after the
downstream write succeeds). A crash before commit re-reads the same
window next run — at-least-once, which composes with idempotent sinks
(MERGE by key) to effectively-once. The state file is swapped in by
atomic rename, never written in place.

Structured Streaming's checkpointed file source covers the same need
for file-granular feeds (``streaming/ingest.py``); the watermark path
is for time-column granularity and non-file sources (JDBC ranges).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_watermark(state_path: str) -> str | None:
    """The committed high watermark (ISO-8601 string), or None."""
    if not os.path.exists(state_path):
        return None
    with open(state_path, encoding="utf-8") as f:
        return json.load(f)["watermark"]


def incremental_read(
    df: DataFrame, ts_col: str, state_path: str
) -> DataFrame:
    """Rows strictly newer than the committed watermark (all rows on
    first run). The filter is a literal comparison — pushed to the
    scan, prunes partitions/row-groups on the time axis."""
    wm = read_watermark(state_path)
    if wm is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(wm).cast("timestamp"))


def commit_watermark(extracted: DataFrame, ts_col: str, state_path: str) -> str | None:
    """Advance the watermark to max(ts_col) of the extracted batch.

    Call AFTER the downstream write succeeds. One tiny agg job; the
    state file is replaced by atomic rename. Returns the new watermark
    (None and no-op for an empty batch — the old watermark stands)."""
    row = extracted.agg(F.max(ts_col).alias("wm")).first()
    if row is None or row["wm"] is None:
        return None
    wm = row["wm"].isoformat(sep=" ")
    d = os.path.dirname(os.path.abspath(state_path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".wm_")
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump({"watermark": wm, "ts_col": ts_col}, f)
    os.replace(tmp, state_path)
    return wm


def read_version_cursor(state_path: str) -> int:
    """Last lake-table version already consumed (-1 = nothing yet)."""
    if not os.path.exists(state_path):
        return -1
    with open(state_path, encoding="utf-8") as f:
        return json.load(f)["version"]


def incremental_lake_changes(
    spark, table_path: str, state_path: str
) -> tuple[DataFrame, int]:
    """Incremental extraction from a versioned lake table's change feed
    (``lake.LakeTable.changes``): returns (changes_df, cursor) where the
    df holds every row-level change committed after the stored cursor,
    with ``_change_type``/``_commit_version`` columns intact.

    This is the CDF consumer half of the high-watermark protocol: the
    watermark is the COMMIT VERSION (exact, no timestamp skew), the
    read costs O(changed rows) regardless of table size, and the same
    commit-after-write rule applies — call :func:`commit_version_cursor`
    with the returned cursor only after the downstream write succeeds.
    A crash re-reads the same version window (at-least-once), which an
    idempotent sink (MERGE by key / txn-marked append) upgrades to
    effectively-once."""
    from ..lake import LakeTable

    t = LakeTable.load(spark, table_path)
    since = read_version_cursor(state_path)
    latest = t.latest_version()
    return t.changes(since, latest), latest


def commit_version_cursor(state_path: str, version: int) -> None:
    """Persist the consumed lake version (atomic rename, like
    :func:`commit_watermark`)."""
    d = os.path.dirname(state_path) or "."
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump({"version": int(version)}, f)
    os.replace(tmp, state_path)
