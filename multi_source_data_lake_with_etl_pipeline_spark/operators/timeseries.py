"""Time-series operators (SURVEY.md §2.10, §2.6, §2.2 L5).

The reference's time-series layer is Influx passthrough: range scans
(``influx_connector.py:142-162``), long-format point writes
(``base_loaders.py:222-240``), relative ranges. Watermarks/windows are
absent there; they're first-class here via Spark's ``window`` /
``session_window`` (batch AND streaming — ``streaming/`` reuses these
shapes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_range(
    df: DataFrame,
    ts_col: str,
    start: str | None = None,
    stop: str | None = None,
    relative: str | None = None,
) -> DataFrame:
    """T1/P4: Influx range(start, stop) semantics. ``relative='1 hour'``
    = Flux ``range(start: -1h)`` against current_timestamp (non-
    deterministic — don't use in oracle-compared queries)."""
    out = df
    if relative is not None:
        out = out.filter(
            F.col(ts_col) >= F.current_timestamp() - F.expr(f"INTERVAL {relative}")
        )
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start).cast("timestamp"))
    if stop is not None:
        out = out.filter(F.col(ts_col) < F.lit(stop).cast("timestamp"))
    return out


def to_points(
    df: DataFrame,
    measurement: str,
    time_col: str,
    tag_cols: Sequence[str],
    field_cols: Sequence[str] | None = None,
) -> DataFrame:
    """L5: melt a wide record into Influx-style long-format points
    ``(time, measurement, <tags>, field, value)``
    (point assembly base_loaders.py:222-240; numeric-default field
    selection :234-239). Uses native ``unpivot`` — a zero-shuffle
    narrow transformation."""
    if field_cols is None:
        field_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in ("double", "float", "long", "integer")
            and f.name not in tag_cols
            and f.name != time_col
        ]
    ids = [time_col, *tag_cols]
    out = df.select(*ids, *[F.col(c).cast("double").alias(c) for c in field_cols])
    out = out.unpivot(ids, field_cols, "field", "value")
    return out.withColumn("measurement", F.lit(measurement)).select(
        F.col(time_col).alias("time"), "measurement", *tag_cols, "field", "value"
    )


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
) -> DataFrame:
    """Tumbling-window aggregation; emits window_start/window_end."""
    g = df.groupBy(F.window(ts_col, duration), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
) -> DataFrame:
    """Sliding-window aggregation (each row lands in duration/slide
    windows)."""
    g = df.groupBy(F.window(ts_col, duration, slide), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence = (),
) -> DataFrame:
    """Session windows (gap-based) — batch mode. A new session starts
    when the inter-event gap is >= ``gap``."""
    g = df.groupBy(F.session_window(ts_col, gap), *keys)
    out = g.agg(*aggs) if aggs else g.count()
    return out.select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *[c for c in out.columns if c != "session_window"],
    )


def resample_ffill(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """Regularize an irregular series onto a fixed grid with forward
    fill — the timeseries-database RESAMPLE/LOCF the reference's Influx
    tier implies but never implements: per key, one slot per ``step``
    between the key's first and last observation; a slot's value is the
    max observation inside it, empty slots carry the last seen value.

    Scale shape: bounds = one map-side-combined agg (a key's grid is
    generated from two scalars, not by scanning its rows); the grid
    explode is a narrow Generate; the observed values join on
    (key, slot) — co-partitioned with the fill window's shuffle, so the
    whole thing is two exchanges end to end. Output columns:
    (key, slot, value_filled)."""
    slot = F.date_trunc(unit, F.col(ts_col))
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("_lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("_hi"),
    )
    # explode_outer + null filter: inner explode's inferred filter
    # would generate the (possibly long) slot sequence twice per key
    # (see llm_ops.dedup._distinct_shingles).
    grid = bounds.select(
        key_col,
        F.explode_outer(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
        ).alias("slot"),
    ).filter(F.col("slot").isNotNull())
    obs = (
        df.select(key_col, slot.alias("slot"), F.col(value_col).alias("_v"))
        .groupBy(key_col, "slot")
        .agg(F.max("_v").alias("_v"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "slot"], "left")
        .withColumn("value_filled", F.last("_v", ignorenulls=True).over(w))
        .drop("_v")
    )


def resample_interpolate(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """Grid resample with LINEAR interpolation: empty slots take the
    time-weighted blend of the surrounding observations
    (prev + (next-prev)·Δt_frac); leading/trailing gaps fall back to
    the one-sided neighbour. Same two-exchange shape as
    :func:`resample_ffill` plus one more window pass (both direction
    windows share the (key, slot) sort)."""
    from pyspark.sql import Window

    base = resample_ffill(df, ts_col, key_col, value_col, step, unit)
    # re-derive the raw slot observations to know WHERE the anchors are
    slot = F.date_trunc(unit, F.col(ts_col))
    obs = (
        df.select(key_col, slot.alias("slot"), F.col(value_col).alias("_obs"))
        .groupBy(key_col, "slot")
        .agg(F.max("_obs").alias("_obs"))
    )
    g = base.drop("value_filled").join(obs, [key_col, "slot"], "left")
    fwd = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ep = F.unix_timestamp("slot").cast("double")
    anchor_ep = F.when(F.col("_obs").isNotNull(), ep)
    prev_v = F.last("_obs", ignorenulls=True).over(fwd)
    next_v = F.first("_obs", ignorenulls=True).over(bwd)
    prev_t = F.last(anchor_ep, ignorenulls=True).over(fwd)
    next_t = F.first(anchor_ep, ignorenulls=True).over(bwd)
    frac = (ep - prev_t) / (next_t - prev_t)
    value = (
        F.when(F.col("_obs").isNotNull(), F.col("_obs"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return g.withColumn("value_interp", value).drop("_obs")
