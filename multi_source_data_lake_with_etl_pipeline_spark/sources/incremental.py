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
