"""Join operators (SURVEY.md §2.4).

The reference's only join is a driver-side nested loop over dicts
(``test_system_integration.py:200-226``) plus per-record upsert probes
(``base_loaders.py:159-173``). Here: the full Spark join surface, plus
the two time-series joins the events workload needs that Spark lacks
as primitives — as-of join and range join.

Scale notes:
- ``key_join`` auto-broadcasts a known-small side; everything else is
  sort-merge with AQE free to switch to shuffled-hash/broadcast at
  runtime.
- ``asof_join`` is the union+window formulation: ONE shuffle on the
  key (no point-in-time cross join, no per-row subquery). This is the
  only formulation that survives 100 TB — both inputs partition by
  key, sort by time within partition, and state is a single running
  "last right-row" per key.
- ``range_join`` is an equi-join on key with a range predicate pushed
  into the join condition — Spark executes equi-part as the shuffle
  key, range as a post-filter within matched groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def key_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """J1: key-equality join (the reference's merge-by-user_id,
    dict-union ⇒ left join, test_system_integration.py:215-226)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row
    with the same key and ``right.ts <= left.ts`` (inclusive).

    Implementation: tag + union + ``last(..., ignorenulls)`` over a
    key-partitioned time-ordered window — one shuffle, no cross join.
    ``tolerance`` (e.g. ``'1 hour'``) nulls matches older than the
    interval, like pandas ``merge_asof(tolerance=...)``.
    """
    keys = [key] if isinstance(key, str) else list(key)
    rcols = [c for c in (right_cols or right.columns) if c not in keys + [right_ts]]

    # Payloads carried as structs so heterogeneous/overlapping schemas
    # don't collide in the union.
    l_payload = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r_payload = F.struct(
        *[F.col(c) for c in rcols], F.col(right_ts).alias("_r_ts")
    ).alias("_r")
    l_type = left.select(l_payload).schema[0].dataType
    r_type = right.select(r_payload).schema[0].dataType

    u = left.select(
        *keys,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        l_payload,
        F.lit(None).cast(r_type).alias("_r"),
    ).unionByName(
        right.select(
            *keys,
            F.col(right_ts).alias("_t"),
            F.lit(0).alias("_side"),
            F.lit(None).cast(l_type).alias("_l"),
            r_payload,
        )
    )

    # right rows (_side=0) sort before left rows at equal ts → inclusive.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance is not None:
        in_tol = F.col("_match._r_ts") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
        matched = matched.withColumn(
            "_match", F.when(in_tol, F.col("_match")).otherwise(F.lit(None))
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_match.{c}").alias(c) for c in rcols]
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Range join: right rows with the same key and
    ``left.ts + lower <= right.ts <= left.ts + upper``."""
    keys = [key] if isinstance(key, str) else list(key)
    cond = None
    for k in keys:
        c = left[k] == right[k]
        cond = c if cond is None else (cond & c)
    cond = (
        cond
        & (right[right_ts] >= left[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return left.join(right, cond, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-mitigated key join: explode the DIM side ``salt`` ways and
    scatter the FACT side's hot keys uniformly across the replicas, so
    one pathological key (a power-user id, a default/null-ish sentinel)
    spreads over ``salt`` tasks instead of stalling one straggler.

    This is the manual fallback for engines/paths where AQE skew-join
    splitting doesn't apply (e.g. the skewed side feeds a co-grouped
    aggregation). With AQE available prefer
    ``spark.sql.adaptive.skewJoin.enabled`` — kept here because the
    reference's ETL has no answer to skew at all and a 100 TB fact
    table always has hot keys.

    Cost model: dim is replicated ``salt``× (use for small/medium dims;
    a broadcastable dim should just use ``key_join(broadcast_right=
    True)`` which needs no salt at all).
    """
    salt_col = (F.rand(seed=42) * salt).cast("int")
    fact_s = fact.withColumn("_salt", salt_col)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, [on, "_salt"], how)
    return out.drop("_salt")


def _deletion_neighborhood(c: Column, max_dist: int = 1) -> Column:
    """FastSS/SymSpell deletion neighborhood as 8-byte hashes: the
    string itself plus every string formed by deleting up to
    ``max_dist`` characters. For any edit script of ≤ k operations
    there exist ≤ k deletions on EACH side reaching a common string
    (substitution at i ⇒ both i-deletions agree; an insertion ⇒ one
    side deletes it), so neighborhood intersection is a COMPLETE
    candidate rule for edit distance ≤ k; it over-generates (deleting
    k from both sides can bridge up to 2k), which the exact
    levenshtein verify removes. Hashing (xxhash64) keeps the exploded
    join key at 8 bytes instead of a near-copy of the string; hash
    false positives die in the same verify. Sizes per string of
    length n: 1 + n (k=1), + n(n-1)/2 (k=2)."""
    if max_dist not in (1, 2):
        raise ValueError("deletion neighborhood supports max_dist 1 or 2")
    n = F.length(c)
    empty = F.array().cast("array<bigint>")

    def del1(i: Column) -> Column:
        return F.concat(c.substr(F.lit(1), i - F.lit(1)), c.substr(i + F.lit(1), n))

    parts = [
        F.array(F.xxhash64(c)),
        F.when(
            n > 0,
            F.transform(F.sequence(F.lit(1), n), lambda i: F.xxhash64(del1(i))),
        ).otherwise(empty),
    ]
    if max_dist >= 2:

        def del2(i: Column, j: Column) -> Column:
            return F.concat(
                c.substr(F.lit(1), i - F.lit(1)),
                c.substr(i + F.lit(1), j - i - F.lit(1)),
                c.substr(j + F.lit(1), n),
            )

        parts.append(
            F.when(
                n >= 2,
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), n - 1),
                        lambda i: F.transform(
                            F.sequence(i + F.lit(1), n),
                            lambda j: F.xxhash64(del2(i, j)),
                        ),
                    )
                ),
            ).otherwise(empty)
        )
    return F.array_distinct(F.concat(*parts))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    block_on: str | Sequence[str],
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    dist_name: str = "edit_dist",
    method: str = "auto",
) -> DataFrame:
    """Blocked approximate-string join (entity-resolution workhorse):
    candidates pair only within equal ``block_on`` values (hash join,
    Σ block² comparisons — never corpus²), pass a length-band
    pre-filter (an edit distance ≤ d implies length difference ≤ d —
    integer compare, rejects most pairs before the expensive metric),
    and keep pairs with ``levenshtein ≤ max_dist``. Appends the
    distance as ``dist_name``.

    Inputs must not share column names apart from ``block_on`` (alias
    before calling, as with any self-join). At scale, blocking choice
    is the lever: block keys should bound group size the way LSH bands
    bound candidate pairs — a skewed block behaves like a skewed join
    key (salt it or split it).

    ``method``:

    - ``"neighborhood"`` (the ``"auto"`` pick for ``max_dist <= 2``):
      FastSS deletion-neighborhood join. Each side explodes to
      ``len+1`` (k=1) or ``O(len²/2)`` (k=2) 8-byte hashes; candidates
      are equality matches on ``(block_on…, variant)`` — O(N·lenᵏ)
      exploded rows and only near-identical strings ever meet, instead
      of the block-quadratic compare-everything of the blocked path.
      This is the shape that survives a hot block (a 1M-row block is
      1M·len variants, not 10¹² comparisons). Exact: candidate recall
      is total for edit distance ≤ k, and an exact levenshtein verify
      removes over-generation and hash false positives. A candidate
      pair is identified by synthetic per-side row ids assigned BEFORE
      the variant explode, so a pair that collides on several shared
      variants still emits once per (left row, right row) — exact bag
      semantics, identical to the ``"block"`` path even when input
      rows are fully duplicated, and the dedup keys are plain longs so
      carried columns may be any type (maps included).
    - ``"block"``: join on ``block_on`` alone, length-band pre-filter,
      exact levenshtein on every surviving in-block pair. Correct for
      any ``max_dist``; quadratic in block size.
    """
    blocks = [block_on] if isinstance(block_on, str) else list(block_on)
    lc, rc = F.col(left_col), F.col(right_col)
    if method == "auto":
        method = "neighborhood" if max_dist in (1, 2) else "block"
    if method == "neighborhood":
        if max_dist not in (1, 2):
            raise ValueError("neighborhood method implements max_dist 1 or 2")
        # explode_outer + null filter: inner explode's inferred filter
        # would inline the whole neighborhood expression twice (see
        # llm_ops.dedup._distinct_shingles). The neighborhood is never
        # empty for non-null input, so no rows are lost.
        # Row ids are assigned before the explode so every variant of a
        # row carries the same id; dedup on (left id, right id) emits
        # each candidate ROW pair exactly once (bag semantics) no
        # matter how many deletion variants it collided on, and keeps
        # the dedup keys orderable regardless of carried column types.
        lv = (
            left.filter(lc.isNotNull())
            .withColumn("_lid", F.monotonically_increasing_id())
            .withColumn("_fv", F.explode_outer(_deletion_neighborhood(lc, max_dist)))
            .filter(F.col("_fv").isNotNull())
        )
        rv = (
            right.filter(rc.isNotNull())
            .withColumn("_rid", F.monotonically_increasing_id())
            .withColumn("_fv", F.explode_outer(_deletion_neighborhood(rc, max_dist)))
            .filter(F.col("_fv").isNotNull())
        )
        cand = (
            lv.join(rv, [*blocks, "_fv"])
            .drop("_fv")
            .dropDuplicates(["_lid", "_rid"])
            .drop("_lid", "_rid")
        )
        return cand.withColumn(dist_name, F.levenshtein(lc, rc)).filter(
            F.col(dist_name) <= max_dist
        )
    return (
        left.join(right, blocks)
        .filter(F.abs(F.length(lc) - F.length(rc)) <= max_dist)
        .withColumn(dist_name, F.levenshtein(lc, rc))
        .filter(F.col(dist_name) <= max_dist)
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_key: str | Column,
    window: int = 3,
    partition_by: str | Sequence[str] | None = None,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Sorted-neighborhood blocking (the other classic ER candidate
    scheme next to hash blocking / ``fuzzy_join``): order records by a
    blocking key and pair each record with its next ``window - 1``
    neighbors — O(N·w) candidates total, independent of block-size
    skew (a hash block with one hot key degenerates to block²; a sort
    window never exceeds N·w).

    Implemented as ``window - 1`` lead() taps over one ordered window —
    a single sort shuffle. ``partition_by`` bounds the sort per
    partition (windows never cross partitions), which is also the
    scale requirement: with no partitioning Spark must sort globally
    in ONE task, so at 100 TB always pass a coarse partition key
    (sliding multi-pass over boundary rows if cross-partition pairs
    matter). ``carry`` columns are emitted for both sides as
    ``<c>_1`` / ``<c>_2``.
    """
    parts = (
        [partition_by] if isinstance(partition_by, str) else list(partition_by or [])
    )
    w = (
        Window.partitionBy(*parts).orderBy(sort_key)
        if parts
        else Window.orderBy(sort_key)
    )
    carried = list(carry)
    # _p flag marks a real neighbor: lead() past the partition end
    # yields a NULL struct, and flag-based presence stays correct even
    # when carried values are themselves NULL.
    me = F.struct(F.lit(True).alias("_p"), *[F.col(c) for c in carried])
    if window <= 1:
        # No neighbors to pair with — empty result, pair schema intact.
        return df.select(
            *parts,
            *[F.col(c).alias(f"{c}_1") for c in carried],
            *[F.col(c).alias(f"{c}_2") for c in carried],
        ).limit(0)
    out = None
    for off in range(1, window):
        nbr = F.lead(me, off).over(w)
        pair = (
            df.select(*parts, me.alias("_a"), nbr.alias("_b"))
            .filter(F.col("_b._p").isNotNull())
            .select(
                *parts,
                *[F.col(f"_a.{c}").alias(f"{c}_1") for c in carried],
                *[F.col(f"_b.{c}").alias(f"{c}_2") for c in carried],
            )
        )
        out = pair if out is None else out.unionByName(pair)
    return out
