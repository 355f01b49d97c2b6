"""Normalization operator (reference ``DataNormalizationTransformer``,
``src/etl/transformers/data_transformers.py:192-225``): schema-mapping
rename, copy-unmapped-as-is, plus the standard rename map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# data_transformers.py:211-218
STANDARD_RENAMES = {
    "id": "record_id",
    "created": "created_at",
    "updated": "updated_at",
    "name": "full_name",
    "phone_number": "phone",
    "email_address": "email",
}


def normalize_schema(
    df: DataFrame,
    mapping: dict[str, str] | None = None,
    apply_standard: bool = True,
) -> DataFrame:
    """Rename per explicit mapping first, then standard renames for any
    still-unmapped original names; unmapped columns pass through
    (data_transformers.py:196-225)."""
    renames: dict[str, str] = {}
    mapping = mapping or {}
    for old, new in mapping.items():
        if old in df.columns:
            renames[old] = new
    if apply_standard:
        for old, new in STANDARD_RENAMES.items():
            if old in df.columns and old not in renames and new not in df.columns:
                renames[old] = new
    return df.withColumnsRenamed(renames)


def coerce_types(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """Whole-column typed coercion (the typed-engine analog of the
    reference's per-value F5 numeric coercion). Uses ``try_cast``-style
    null-on-failure so one bad value never fails the stage (V6
    error-tolerance, data_transformers.py:303-308)."""
    return df.withColumns(
        {c: F.col(c).try_cast(t) for c, t in casts.items() if c in df.columns}
    )


def schema_compatible(required, target) -> bool:
    """V7: all required field names of ``required`` present in
    ``target`` (common_utils.py:431-438). Accepts DataFrames,
    StructTypes, or iterables of names."""

    def names(s) -> set[str]:
        if hasattr(s, "schema"):
            s = s.schema
        if hasattr(s, "fieldNames"):
            return set(s.fieldNames())
        return set(s)

    return names(required) <= names(target)
