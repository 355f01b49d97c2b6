"""Count-min sketch as DataFrame ops: mergeable frequency sketching
for heavy-hitter detection over unbounded key domains.

At 100 TB the exact per-term frequency table (vocab, URLs, user ids)
can itself be too large to shuffle; a CMS is a fixed-size (depth ×
width) counter grid that answers point frequency queries with
one-sided error: **estimate ≥ true count, always** (each of the
``depth`` hash rows adds full mass to one bucket; collisions only
inflate). The grid is built with one map-side-combinable aggregation
(depth×N tiny rows → depth×width groups), is trivially mergeable
across shards/days (cell-wise +), and estimation is a broadcast join
against the grid.

Spark's builtin ``count_min_sketch`` aggregate returns an opaque
binary blob; this keeps the grid AS A DATAFRAME so estimates, merges
and error audits stay declarative (and the one-sided-error invariant
is checkable by the oracle harness — `cms_frequency_invariant`).

Reference parity: the reference has no sketching at all; this extends
its A2-A6 profiling family to cardinalities where exact counting
stops being feasible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cms_bucket(term: F.Column, row: int, width: int) -> F.Column:
    """Bucket of ``term`` in hash row ``row``: pmod(xxhash64(term, seed=row), width).
    xxhash64 with per-row seeds gives ``depth`` independent-enough hash
    functions, all JVM-side."""
    return F.pmod(F.xxhash64(term, F.lit(row)), F.lit(width))


def cms_build(
    df: DataFrame, term_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the (row, bucket, cnt) grid: each term lands in one bucket
    per hash row. One explode (×depth) + one aggregation with map-side
    combine — output is depth×width rows regardless of input size."""
    t = F.col(term_col)
    entries = F.array(
        *[
            F.struct(F.lit(i).alias("row"), cms_bucket(t, i, width).alias("bucket"))
            for i in range(depth)
        ]
    )
    return (
        df.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two grids built with the same (depth, width): cell-wise
    sum — the property that makes CMS shard/stream friendly."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, terms: DataFrame, term_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-frequency estimates for every row of ``terms``:
    min over hash rows of the term's bucket count (0 if the bucket is
    absent from the grid). The grid is depth×width rows — broadcast it;
    the term side stays a scan + narrow join."""
    t = F.col(term_col)
    exploded = terms.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"), cms_bucket(t, i, width).alias("bucket")
                    )
                    for i in range(depth)
                ]
            )
        ).alias("e"),
    ).select(term_col, F.col("e.row").alias("row"), F.col("e.bucket").alias("bucket"))
    joined = exploded.join(F.broadcast(cms), ["row", "bucket"], "left")
    return joined.groupBy(term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )


# --- HyperLogLog distinct sketches (Apache DataSketches via Spark's
# native hll_* aggregates) -------------------------------------------
#
# The non-additive twin of the CMS story: COUNT(DISTINCT x) does not
# pre-aggregate — a daily rollup cube can sum counts but not distincts,
# so at 100 TB the only viable shape is a MERGEABLE sketch per cell
# (per partition / day / source), unioned at query time. Spark ships
# the DataSketches HLL aggregates natively (hll_sketch_agg /
# hll_union_agg / hll_sketch_estimate, JVM-side, map-side combinable),
# so the whole pattern stays whole-stage-codegen with zero Python.
# Merge is exact: union of per-cell sketches is bit-identical to the
# sketch of the unioned input (same lgConfigK), which the
# `hll_distinct_invariant` query checks, alongside the estimate's
# documented ~1.6%/sqrt(2^lgK) error envelope vs exact distincts.


def hll_profile(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 14
) -> DataFrame:
    """Per-group distinct sketch: (group_cols..., hll binary). One
    map-side-combinable aggregation; sketch size ≤ 2^lgk bytes-ish per
    group regardless of cardinality."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll")
    )


def hll_rollup(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll sketches up to a coarser grouping (e.g. day→month, or []
    for the global sketch) by HLL union — no rescan of the base data."""
    return df.groupBy(*group_cols).agg(F.hll_union_agg("hll").alias("hll"))


def hll_estimates(df: DataFrame, est_name: str = "approx_distinct") -> DataFrame:
    """Materialize estimates from a sketch table's ``hll`` column."""
    return df.withColumn(est_name, F.hll_sketch_estimate("hll")).drop("hll")
