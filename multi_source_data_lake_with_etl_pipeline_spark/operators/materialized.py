"""Incremental materialized-aggregate maintenance from a change feed.

The reference recomputes its aggregates from scratch every pipeline
run (``data_transformers.py:227-288`` buffers a batch and re-groups
it). At 100 TB a nightly full re-aggregation is the dominant cost of a
gold layer, and the lake's change data feed (``lake.LakeTable.changes``
— insert / update_preimage / update_postimage / delete, the Delta CDF
shape) makes it unnecessary for additive aggregates: each change row
contributes ``+measure`` (insert, update_postimage) or ``-measure``
(delete, update_preimage), so a sum/count materialized view is
maintained with ONE aggregation over the changes — O(changed rows),
never O(table) — followed by a key-equality merge into the view.

Only additive aggregates (sum, count, and anything derivable from
them: avg = sum/count) maintain this way; min/max need the base table
on deletes and are out of scope here (recompute path).

Exactness: with integer/decimal measures the maintained view is
bit-identical to a full recompute regardless of change order (addition
over the integers/decimals is associative-commutative). Float sums
drift by reassociation — use decimal measures when the invariant
matters (``mv_incremental_invariant`` does).

Scale shape: the delta aggregation partial-aggregates map-side and
shuffles only distinct changed GROUPS; the apply step is a key join of
the view with that (small) delta — broadcastable whenever a batch
touches few groups. The view itself never re-shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Change-type weights: how one CDF row enters an additive aggregate.
_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def aggregate_snapshot(
    df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Full (re)compute of the view: keys..., {c}_sum..., _record_count.
    Run once at view creation; afterwards ``maintain_aggregate`` keeps
    it current from the change feed alone.

    NULL measure values contribute 0 (sums are coalesced), so a group
    whose measures are all NULL snapshots to 0 — the same value the
    incremental path maintains; keeps maintained == recompute exact."""
    return df.groupBy(*keys).agg(
        *[F.coalesce(F.sum(c), F.lit(0)).alias(f"{c}_sum") for c in sum_cols],
        F.count(F.lit(1)).alias("_record_count"),
    )


def aggregate_delta(
    changes: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Collapse a CDF slice into per-group additive deltas.

    One aggregation over the changes: weight +1 for rows entering the
    table (insert/update_postimage), -1 for rows leaving it
    (delete/update_preimage); groups whose net effect is zero rows AND
    zero sums are dropped (a same-group update touches nothing)."""
    w = (
        F.when(F.col("_change_type").isin(*_ADD), F.lit(1))
        .when(F.col("_change_type").isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    delta = changes.groupBy(*keys).agg(
        *[F.sum(w * F.col(c)).alias(f"_d_{c}") for c in sum_cols],
        F.sum(w).alias("_d_count"),
    )
    nonzero = F.col("_d_count") != 0
    for c in sum_cols:
        nonzero = nonzero | (F.col(f"_d_{c}") != 0)
    return delta.filter(nonzero)


def apply_aggregate_delta(
    view: DataFrame, delta: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Merge per-group deltas into the view (new groups appear,
    drained groups — count reaching 0 — disappear).

    A full-outer join cannot use a broadcast build side (Spark ignores
    the hint and falls back to sort-merge, shuffling the WHOLE view
    for a small maintenance batch), so the merge is split into legs
    where broadcast IS legal: (1) view LEFT-join broadcast(delta) —
    updates existing groups, zero view shuffle; (2) a broadcast
    semi-probe of the view for delta keys already present, whose
    (small, ≤|delta|) result drives an anti-join producing brand-new
    groups. Two broadcast-side scans of the view replace one full
    shuffle of it — the trade that wins at 100 TB."""
    keys = list(keys)
    upd = view.join(F.broadcast(delta), keys, "left")
    present = view.select(*keys).join(
        F.broadcast(delta.select(*keys)), keys, "left_semi"
    )
    ins = delta.join(F.broadcast(present), keys, "left_anti")
    for c in sum_cols:
        ins = ins.withColumn(
            f"{c}_sum", F.lit(None).cast(view.schema[f"{c}_sum"].dataType)
        )
    ins = ins.withColumn(
        "_record_count", F.lit(None).cast(view.schema["_record_count"].dataType)
    )
    merged = upd.unionByName(ins.select(*upd.columns))
    new_count = F.coalesce(F.col("_record_count"), F.lit(0)) + F.coalesce(
        F.col("_d_count"), F.lit(0)
    )
    out_cols = [*keys]
    for c in sum_cols:
        sum_col = f"{c}_sum"
        zero = F.lit(0).cast(view.schema[sum_col].dataType)
        out_cols.append(
            (
                F.coalesce(F.col(sum_col), zero)
                + F.coalesce(F.col(f"_d_{c}"), zero)
            ).alias(sum_col)
        )
    out_cols.append(new_count.alias("_record_count"))
    return merged.select(*out_cols).filter(F.col("_record_count") > 0)


def maintain_aggregate(
    view: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """One maintenance step: view ⊕ aggregate_delta(changes). Feed it
    ``LakeTable.changes(last_seen_version)`` and persist the result as
    the new view (pairs with ``sources.incremental`` version cursors)."""
    return apply_aggregate_delta(
        view, aggregate_delta(changes, keys, sum_cols), keys, sum_cols
    )
