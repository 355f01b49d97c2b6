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


# ---------------------------------------------------------------------------
# Bloom filter as DataFrame ops: broadcastable membership pruning.
#
# At 100 TB a semi-join against a large key set (decontamination
# denylists, already-ingested ids, dedup survivors) shuffles the fact
# table on the key. A Bloom filter makes that a SCAN: build an m-bit
# bitmap over the key set (one aggregation), broadcast the bitmap (m/8
# bytes — 8 KB for 2^16 bits — vs. the full key set), and flag rows
# with pure JVM bit tests. Guarantee is one-sided: NO false negatives,
# false-positive rate ~ (1-e^{-kn/m})^k — so it prunes candidates
# ahead of an exact verify, never loses a match (checked end-to-end by
# `bloom_prune_invariant`). Per-shard blooms OR-merge (`bloom_merge`)
# without rescanning, same as the CMS/HLL mergeability above.
# (Spark's internal BloomFilterAggregate is not SQL-exposed, and the
# driver-side DataFrameStatFunctions.bloomFilter object can't be used
# as a Column predicate — hence the explicit bitmap-as-array build.)


def _bloom_pos(key: F.Column, i, m_bits: int) -> F.Column:
    """Bit position of ``key`` under hash ``i``: pmod(xxhash64(key, i), m).
    Hashing (key, i) pairs gives k independent-enough functions, the
    same per-seed trick as ``cms_bucket`` — all JVM-side."""
    return F.pmod(F.xxhash64(key, i if isinstance(i, F.Column) else F.lit(i)), F.lit(m_bits))


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 5
) -> DataFrame:
    """Build the bitmap as a ONE-ROW frame (_bf array<long>, _m, _k).

    Shape: explode each key's k positions → group by 64-bit word →
    bit_or the in-word bits (map-side combinable) → assemble the dense
    word array in a single-row final aggregation (map lookup over a
    constant-folded index sequence — no driver-side collect, the
    result rides to consumers as a broadcast frame)."""
    assert m_bits % 64 == 0, "m_bits must be a multiple of 64"
    nwords = m_bits // 64
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: _bloom_pos(F.col(key_col), i, m_bits),
        )
    ).alias("_pos")
    words = (
        df.select(pos)
        .select(
            (F.col("_pos") / 64).cast("int").alias("_word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("_pos") % 64).cast("int")
            ).alias("_bit"),
        )
        .groupBy("_word")
        .agg(F.bit_or("_bit").alias("_bits"))
    )
    return (
        words.agg(
            F.map_from_arrays(
                F.collect_list("_word"), F.collect_list("_bits")
            ).alias("_map")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(nwords - 1)),
                lambda w: F.coalesce(F.element_at(F.col("_map"), w), F.lit(0).cast("long")),
            ).alias("_bf"),
            F.lit(m_bits).alias("_m"),
            F.lit(k).alias("_k"),
        )
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """OR-merge two same-shape blooms (per-shard builds, union
    semantics) — no rescan of either input."""
    bf_b = b.select(
        F.col("_bf").alias("_bf_b"), F.col("_m").alias("_m_b"), F.col("_k").alias("_k_b")
    )
    return (
        a.crossJoin(F.broadcast(bf_b))
        .where((F.col("_m") == F.col("_m_b")) & (F.col("_k") == F.col("_k_b")))
        .select(
            F.zip_with("_bf", "_bf_b", lambda x, y: x.bitwiseOR(y)).alias("_bf"),
            "_m",
            "_k",
        )
    )


def bloom_might_contain(
    df: DataFrame, bloom: DataFrame, key_col: str, flag_col: str = "bloom_hit"
) -> DataFrame:
    """Add ``flag_col``: true iff every one of the k bits for the row's
    key is set. The bitmap joins in as a one-row broadcast frame and
    the test is k element_at/AND ops per row — scan speed, no shuffle
    of ``df``. False → definitely NOT in the build set (prune);
    true → candidate for the exact verify. Persist the bloom frame
    when probing more than once — the parameter read below plus the
    crossJoin re-execute the build DAG otherwise."""
    params = bloom.select("_m", "_k").first()
    m_bits, k = params["_m"], params["_k"]
    hit = F.forall(
        F.transform(
            F.sequence(F.lit(1), F.lit(k)),
            lambda i: (
                F.element_at(
                    F.col("_bf"),
                    (_bloom_pos(F.col(key_col), i, m_bits) / 64).cast("int") + 1,
                ).bitwiseAND(
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        (_bloom_pos(F.col(key_col), i, m_bits) % 64).cast("int"),
                    )
                )
                != 0
            ),
        ),
        lambda x: x,
    )
    return (
        df.crossJoin(F.broadcast(bloom))
        .withColumn(flag_col, hit)
        .drop("_bf", "_m", "_k")
    )
