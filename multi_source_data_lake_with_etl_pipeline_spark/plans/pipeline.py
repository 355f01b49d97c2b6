"""Declarative ETL job spec → ONE lazy DataFrame plan.

Reference lifecycle (``src/api/main.py:224-280``): job spec dict →
extractor dispatch → per-record transformer chain materialized in
driver memory → routed load. Here the same spec compiles to a single
lazy plan, so Catalyst sees extract + transform + load together
(predicate/projection pushdown across the whole job) and nothing is
ever materialized driver-side.

Transform names mirror the API's transformation list
(``main.py:243-249``: "cleaning", "validation", ...) plus the rest of
the operator library.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..operators import aggregation, cleaning, dedup, enrichment, normalization, validation
from ..sinks.routing import LoaderManager
from ..sources.registry import ExtractorRegistry


@dataclass
class TransformStep:
    name: str
    params: dict = field(default_factory=dict)


@dataclass
class ETLJob:
    """ETLJobRequest shape (main.py:141-146)."""

    source_type: str
    source_config: dict
    target_config: dict[str, dict]  # routing config: {dest: {type, params}}
    transformations: Sequence[TransformStep] = ()


# name → (df, **params) -> df
_TRANSFORMS: dict[str, Callable[..., DataFrame]] = {
    "cleaning": lambda df, **p: cleaning.clean(df, **p),
    "nan_to_null": lambda df, **p: cleaning.nan_to_null(df, **p),
    "validation": lambda df, rules=(), **p: validation.validate(
        df, [validation.FieldRule(**r) if isinstance(r, dict) else r for r in rules], **p
    ),
    "filter_valid": lambda df, **p: validation.filter_valid(df),
    "enrichment": lambda df, **p: enrichment.enrich(df, **p),
    "normalization": lambda df, **p: normalization.normalize_schema(df, **p),
    "coerce_types": lambda df, **p: normalization.coerce_types(df, **p),
    "aggregation": lambda df, **p: aggregation.aggregate(df, **p),
    "deduplication": lambda df, **p: dedup.deduplicate(df, **p),
    "filter": lambda df, predicate="true", **p: df.filter(predicate),
}


def register_transform(name: str, fn: Callable[..., DataFrame]) -> None:
    """U2 extension point: user-defined DataFrame->DataFrame stages."""
    _TRANSFORMS[name] = fn


def build_plan(
    spark: SparkSession,
    job: ETLJob,
    extractors: ExtractorRegistry | None = None,
) -> DataFrame:
    """Compile spec → lazy plan (no execution)."""
    reg = extractors or ExtractorRegistry()
    df = reg.extract(spark, job.source_type, **job.source_config)
    for step in job.transformations:
        if step.name not in _TRANSFORMS:
            raise ValueError(
                f"unknown transformation {step.name!r}; known: {sorted(_TRANSFORMS)}"
            )
        df = df.transform(lambda d, s=step: _TRANSFORMS[s.name](d, **s.params))
    return df


def run_job(
    spark: SparkSession,
    job: ETLJob,
    extractors: ExtractorRegistry | None = None,
    loaders: LoaderManager | None = None,
) -> dict:
    """Execute: build plan → routed load → job result envelope
    (main.py:271-277 shape)."""
    mgr = loaders or LoaderManager()
    df = build_plan(spark, job, extractors)
    load_results = mgr.route_and_load(df, job.target_config)
    return {
        "status": "completed"
        if all(r["status"] == "success" for r in load_results.values())
        else "partial",
        "destinations": load_results,
    }


def deep_merge(base: dict, override: dict) -> dict:
    """F19: recursive config merge (common_utils.py:354-365) — driver-
    side job-spec composition (defaults ⊕ per-source overrides), not a
    data op. Returns a new dict; nested dicts merge, scalars override."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out
