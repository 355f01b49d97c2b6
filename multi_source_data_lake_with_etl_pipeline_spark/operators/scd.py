"""Slowly-changing-dimension (SCD Type 2) builders.

The reference's upsert loader (``base_loaders.py:149-181``) implements
SCD Type 1 — update-in-place, history lost. Type 2 keeps every
attribute version as a validity interval; it is the standard shape for
dimension history in a lake warehouse, and both operators here are
pure DataFrame plans:

- :func:`scd2_build` — collapse a full change history into versioned
  rows ``(key, attrs..., valid_from, valid_to, is_current)``. One
  window pass to find change points (run-length collapse of
  consecutive identical attribute tuples), one aggregation per
  version, one lead() for the interval ends — all partitioned by the
  dimension key, so a 100 TB history shuffles once on the key and
  never compares rows across keys.
- :func:`scd2_apply` — merge a new snapshot batch into an existing
  dimension: close out current versions whose attributes changed,
  insert new versions for changed/new keys. O(batch + current rows);
  historical (closed) rows pass through untouched, so the operator
  composes with partition/file pruning on ``is_current``.

Batch/build parity — applying snapshots one at a time equals building
from the concatenated history — is pinned by
``tests/test_operators.py::TestSCD2``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_build(
    df: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an event-grained change history into SCD2 intervals.

    Consecutive rows (per ``key``, ordered by ``ts_col`` then
    ``tiebreak``) with identical ``attrs`` merge into one version;
    ``valid_from`` is the version's first timestamp, ``valid_to`` the
    next version's start (NULL for the current version). Null-safe
    attribute comparison: a NULL attr equals NULL (no phantom
    versions from missing data).

    ``(ts_col, tiebreak)`` must uniquely order rows within a key:
    with duplicate order keys lag() over peer rows is nondeterministic
    and version numbering unstable. The running version count uses an
    explicit ROWS frame — the default RANGE frame would make peer rows
    share a frame, breaking the count even for unique keys expressed
    as ties."""
    attrs = list(attrs)
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cur = F.struct(*[F.col(a) for a in attrs])
    prev = F.lag(cur).over(w)
    is_new = F.when(prev.isNull() | ~prev.eqNullSafe(cur), 1).otherwise(0)
    versioned = df.select(
        key, ts_col, *attrs, F.sum(is_new).over(wrows).alias("_ver")
    )
    per_ver = versioned.groupBy(key, "_ver", *attrs).agg(
        F.min(ts_col).alias("valid_from")
    )
    w2 = Window.partitionBy(key).orderBy("valid_from")
    return per_ver.select(
        key,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_apply(
    dim: DataFrame,
    batch: DataFrame,
    key: str,
    ts_col: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Merge one snapshot ``batch`` (one row per key: the key's state
    observed at ``batch[ts_col]``) into an SCD2 dimension ``dim``
    (schema as produced by :func:`scd2_build`).

    - unchanged keys: dimension rows pass through;
    - changed keys: the current version closes (``valid_to`` = batch
      timestamp) and a new current version is inserted;
    - brand-new keys: inserted as their first current version.

    Closed (non-current) history never joins the batch — at scale,
    pair with an ``is_current`` partition so the join touches only the
    current slice."""
    attrs = list(attrs)
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    b = batch.select(
        F.col(key),
        F.col(ts_col).alias("_b_ts"),
        *[F.col(a).alias(f"_b_{a}") for a in attrs],
    )
    j = cur.join(b, key, "full_outer")
    same = F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
        F.struct(*[F.col(f"_b_{a}").alias(a) for a in attrs])
    )
    in_batch = F.col("_b_ts").isNotNull()
    in_dim = F.col("valid_from").isNotNull()
    # Surviving current rows: unchanged, or absent from this batch.
    keep_cur = j.filter(in_dim & (~in_batch | same)).select(cur.columns)
    # Changed keys: close the old version at the batch timestamp.
    closed = (
        j.filter(in_dim & in_batch & ~same)
        .select(
            key,
            *attrs,
            "valid_from",
            F.col("_b_ts").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    # New current versions: changed keys + never-seen keys.
    opened = (
        j.filter(in_batch & (~in_dim | ~same))
        .select(
            key,
            *[F.col(f"_b_{a}").alias(a) for a in attrs],
            F.col("_b_ts").alias("valid_from"),
            F.lit(None).cast(dict(dim.dtypes)["valid_to"]).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return hist.unionByName(keep_cur).unionByName(closed).unionByName(opened)
