"""Exact dedup operators (SURVEY.md §2.7 D1-D4, W4).

Reference: md5-of-sorted-key-JSON record hash (common_utils.py:177-186),
duplicate-group finder (:189-201), keep-first/keep-last dedup
(:204-226). Near-dup (MinHash/SimHash/…) lives in ``llm_ops.dedup``.

Scale notes: hash-dedup is one shuffle on the hash key; keep-first/last
is a window over the same partitioning (no extra shuffle). For 100 TB,
both get AQE skew handling; the hash key is uniform by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import md5_record_hash


def with_record_hash(
    df: DataFrame, key_fields: Sequence[str] | None = None, out_col: str = "_record_hash"
) -> DataFrame:
    """D1: stable record hash over sorted key fields."""
    fields = sorted(key_fields or df.columns)
    return df.withColumn(out_col, md5_record_hash(*fields))


def find_duplicates(
    df: DataFrame, key_fields: Sequence[str] | None = None
) -> DataFrame:
    """D2: groups with >1 occurrence → (hash, dup_count, example keys)."""
    fields = sorted(key_fields or df.columns)
    return (
        with_record_hash(df, fields)
        .groupBy("_record_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            *[F.first(f).alias(f) for f in fields],
        )
        .filter(F.col("dup_count") > 1)
    )


def deduplicate(
    df: DataFrame,
    key_fields: Sequence[str] | None = None,
    keep: str = "first",
    order_col: str | None = None,
) -> DataFrame:
    """D3/W4: keep one row per key.

    The reference's 'first'/'last' refer to list arrival order
    (common_utils.py:213-224) — meaningless for a distributed table, so
    ``order_col`` supplies the ordering ('first' = lowest, 'last' =
    highest). Without it, falls back to ``dropDuplicates`` (any one
    row, single shuffle — the cheapest correct plan).
    """
    fields = list(key_fields or df.columns)
    if order_col is None:
        return df.dropDuplicates(fields)
    direction = F.asc(order_col) if keep == "first" else F.desc(order_col)
    w = Window.partitionBy(*fields).orderBy(direction)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
