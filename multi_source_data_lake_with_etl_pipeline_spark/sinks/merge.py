"""Upsert / delete on parquet lake tables (reference L4 / L10).

Reference upsert is per-record find-then-update-or-insert
(``base_loaders.py:149-181``); deletes are filter-based
(``mongo_connector.py:152-161``, ``influx_connector.py:274-291``).

Lake-format equivalent: Delta ``MERGE INTO`` / ``DELETE FROM``. This
container has no Delta package, so the same semantics are provided as
copy-on-write over parquet — a full-outer-join merge plan written back
atomically (write temp → swap). At 100 TB you'd partition the table
and rewrite ONLY partitions containing matched keys (partition-pruned
merge); the join itself is the identical plan Delta executes.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert_df(target: DataFrame, source: DataFrame, key: str) -> DataFrame:
    """The MERGE plan: whenMatchedUpdateAll / whenNotMatchedInsertAll.

    Returns the merged DataFrame (lazy). Column set = target's; source
    must carry the same columns."""
    cols = target.columns
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    # Source row present ⇒ take source values wholesale (including its
    # nulls — coalesce per column would wrongly keep stale target values
    # when an update nulls a field).
    src_present = F.col(f"s.{key}").isNotNull()
    picked = [
        F.when(src_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
    ]
    return joined.select(*picked)


def merge_upsert(
    spark: SparkSession, table_path: str, source: DataFrame, key: str
) -> dict:
    """L4: upsert ``source`` into the parquet table at ``table_path``
    by ``key``; returns {inserted, updated} counts like the reference
    (base_loaders.py:177-181). Copy-on-write: temp write + atomic swap."""
    target = spark.read.parquet(table_path)
    src = source.persist()
    tgt_keys = target.select(key).distinct()
    updated = src.join(tgt_keys, key, "left_semi").count()
    inserted = src.count() - updated

    merged = merge_upsert_df(target, src, key)
    tmp = tempfile.mkdtemp(prefix="merge_", dir=os.path.dirname(table_path) or ".")
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(table_path)
    os.rename(tmp, table_path)
    src.unpersist()
    return {"inserted": inserted, "updated": updated}


def delete_where(spark: SparkSession, table_path: str, predicate: str) -> int:
    """L10: DELETE FROM table WHERE predicate (copy-on-write). Returns
    deleted-row count."""
    df = spark.read.parquet(table_path)
    keep = df.filter(~F.expr(predicate))
    deleted = df.count() - keep.count()
    tmp = tempfile.mkdtemp(prefix="del_", dir=os.path.dirname(table_path) or ".")
    keep.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(table_path)
    os.rename(tmp, table_path)
    return deleted
