"""Data-cleaning operator (reference ``DataCleaningTransformer``,
``src/etl/transformers/data_transformers.py:28-91``).

The reference walks each record dict and per-key applies: empty/NaN →
None, trim, email lowercase, title-case for status/country/state,
numeric-string coercion, phone formatting, then stamps ``_cleaned_at``
(``data_transformers.py:67``).

Spark version: one ``withColumns`` pass of pure column expressions —
whole-stage-codegen'd, no Python in the loop, columnar at any scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalar import normalize_phone, title_case

# Key-targeted behaviors from the reference's cleaner.
EMAIL_KEYS = ("email",)  # data_transformers.py:48-49
TITLE_KEYS = ("country", "state", "status")  # data_transformers.py:50-51
PHONE_KEYS = ("phone", "phone_number")  # data_transformers.py:72-83


def _clean_string(name: str, c: Column, coerce_numeric_strings: bool) -> Column:
    # F6: '' → null (data_transformers.py:39-41), then F1 trim (:44-46).
    out = F.trim(c)
    out = F.when(out == "", F.lit(None)).otherwise(out)
    if name in EMAIL_KEYS:
        out = F.lower(out)  # F2 (:48-49)
    elif name in TITLE_KEYS:
        out = title_case(out)  # F3 (:50-51)
    elif name in PHONE_KEYS:
        out = normalize_phone(out)  # F4 (:72-83)
    elif coerce_numeric_strings:
        # F5 (:58-62): numeric-looking strings stay strings in Spark's
        # typed model unless the whole column coerces; per-value mixed
        # typing doesn't exist in a typed engine, so we keep the string
        # (documented deviation; use operators.normalization.coerce_types
        # for whole-column casts).
        pass
    return out


def clean(
    df: DataFrame,
    string_cols: Sequence[str] | None = None,
    add_lineage: bool = True,
    coerce_numeric_strings: bool = False,
) -> DataFrame:
    """Apply the reference's cleaning pass to every string column
    (or the named subset). Adds ``_cleaned_at`` lineage col."""
    targets = string_cols or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    updates = {
        name: _clean_string(name, F.col(name), coerce_numeric_strings) for name in targets
    }
    out = df.withColumns(updates)
    if add_lineage:
        out = out.withColumn("_cleaned_at", F.current_timestamp())
    return out


def nan_to_null(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """P9: NaN→null normalization (base_extractors.py:221). Spark keeps
    NaN distinct from null for doubles; the reference's pandas path
    erases that distinction, so we offer the same."""
    targets = cols or [
        f.name for f in df.schema.fields if isinstance(f.dataType, (T.DoubleType, T.FloatType))
    ]
    return df.withColumns(
        {c: F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)) for c in targets}
    )
