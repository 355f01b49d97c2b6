"""Config-driven group-by aggregation (reference A1).

Reference: ``AggregationTransformer`` buffers records, runs one pandas
``groupby`` per batch, names outputs ``{field}_{func}`` and appends
``_record_count`` + ``_aggregated_at``
(``src/etl/transformers/data_transformers.py:227-288``; func dispatch
``:262-274``, naming ``:266-274``).

Spark version: a single ``groupBy(...).agg(...)`` — hash aggregate with
map-side partial aggregation, so at 100 TB the shuffle carries only
per-group partials, not rows. No buffering/batching layer is needed:
Spark's execution model IS the batching.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# func name -> Column builder; mirrors the reference's dispatch table
# (data_transformers.py:262-274).
_AGG_FUNCS = {
    "count": F.count,
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
    "first": F.first,
    "last": F.last,
    "collect_set": F.collect_set,
}


def _agg_exprs(
    aggregations: dict[str, Sequence[str]], add_record_count: bool = True
) -> list[Column]:
    exprs: list[Column] = []
    for field, funcs in aggregations.items():
        if isinstance(funcs, str):
            funcs = [funcs]
        for fn in funcs:
            if fn not in _AGG_FUNCS:
                raise ValueError(f"unsupported aggregation function: {fn!r}")
            exprs.append(_AGG_FUNCS[fn](field).alias(f"{field}_{fn}"))
    if add_record_count:
        exprs.append(F.count(F.lit(1)).alias("_record_count"))
    return exprs


def aggregate(
    df: DataFrame,
    group_by_fields: Sequence[str],
    aggregations: dict[str, Sequence[str]],
    add_record_count: bool = True,
    add_timestamp: bool = False,
    mode: str = "groupby",
) -> DataFrame:
    """A1 with the reference's exact output-naming convention.

    mode: 'groupby' | 'rollup' | 'cube' — rollup/cube are the natural
    Spark superset of the reference's flat groupby (SURVEY.md §2.5).
    """
    exprs = _agg_exprs(aggregations, add_record_count)
    if mode == "groupby":
        grouped = df.groupBy(*group_by_fields)
    elif mode == "rollup":
        grouped = df.rollup(*group_by_fields)
    elif mode == "cube":
        grouped = df.cube(*group_by_fields)
    else:
        raise ValueError(f"unknown mode: {mode!r}")
    out = grouped.agg(*exprs)
    if add_timestamp:
        # _aggregated_at lineage col (data_transformers.py:276) — off by
        # default because it breaks result determinism.
        out = out.withColumn("_aggregated_at", F.current_timestamp())
    return out
