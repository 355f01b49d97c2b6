"""Snapshot diffing: row-level reconciliation of two versions of a
keyed dataset (datacompy/Delta-diff shape).

The ETL debugging tool the reference's users reach for after every
backfill: "what did this rerun actually change?". Pairs with the lake's
change-data feed (lake.py:changes) — the CDF answers it for lake-native
writes, snapshot_diff answers it for ANY two DataFrames (e.g. a table
re-extracted from Postgres vs yesterday's lake snapshot).

One full-outer shuffle join on the key — both sides hash-partitioned
once, no driver materialization, null-safe column compares (<=> so a
NULL→value flip counts as changed, not unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of ``new`` vs ``old`` by ``keys``.

    Returns key columns + ``diff_status`` ∈
    {added, removed, changed, unchanged}; for non-key columns present
    in both frames (or ``compare_cols``), `changed` means at least one
    null-safe inequality.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c in set(old.columns) and c not in keys
        ]
    # explicit presence markers — inferring presence from key nullness
    # misclassifies rows whose key IS NULL (a NULL key never joins, so
    # such rows surface as one removed + one added, which the markers
    # classify correctly where a keys[0]-IS-NULL test could not)
    o = old.select(
        *[F.col(k).alias(f"_ko_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(1).alias("_o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_kn_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(1).alias("_n_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ko_{k}") == F.col(f"_kn_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")
    in_old = F.col("_o_present").isNotNull()
    in_new = F.col("_n_present").isNotNull()
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *[
            F.coalesce(F.col(f"_kn_{k}"), F.col(f"_ko_{k}")).alias(k)
            for k in keys
        ],
        status.alias("diff_status"),
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Aggregate of ``snapshot_diff``: one row per status with exact
    counts — the four numbers a backfill review actually reads."""
    return (
        snapshot_diff(old, new, keys, compare_cols)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
