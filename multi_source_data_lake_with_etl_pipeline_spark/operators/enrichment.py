"""Enrichment operator (reference ``DataEnrichmentTransformer``,
``src/etl/transformers/data_transformers.py:152-189``).

Adds: ``_ingested_at`` (:162), age from birth_date (:164-171), postal
code extraction (:174-179), and ``_record_hash`` (:181-184 — reference
uses process-nondeterministic Python ``hash()``; we use stable md5,
SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import age_years, md5_record_hash, postal_code

# data_transformers.py:182 — hash source fields, fallback first 3 keys.
DEFAULT_HASH_FIELDS = ("email", "phone", "name")


def enrich(
    df: DataFrame,
    birth_date_col: str | None = None,
    address_col: str | None = None,
    hash_fields: Sequence[str] | None = None,
    as_of: Column | None = None,
    add_lineage: bool = True,
) -> DataFrame:
    cols = set(df.columns)
    out = df
    if birth_date_col is None and "birth_date" in cols:
        birth_date_col = "birth_date"
    if address_col is None and "address" in cols:
        address_col = "address"
    if birth_date_col and birth_date_col in cols:
        out = out.withColumn("age", age_years(F.col(birth_date_col), as_of))
    if address_col and address_col in cols:
        out = out.withColumn("postal_code", postal_code(F.col(address_col)))
    hf = [c for c in (hash_fields or DEFAULT_HASH_FIELDS) if c in cols]
    if not hf:
        hf = sorted(cols)[:3]  # fallback: first keys (data_transformers.py:183)
    out = out.withColumn("_record_hash", md5_record_hash(*sorted(hf)))
    if add_lineage:
        out = out.withColumn("_ingested_at", F.current_timestamp())
    return out


def add_provenance(
    df: DataFrame, source_name: str, source_kind: str = "table"
) -> DataFrame:
    """DAG provenance stamping (multi_source_ingestion_dag.py:65-66,
    99-100, 148-149): ``_source_{kind}`` + ``_extraction_timestamp``."""
    return df.withColumns(
        {
            f"_source_{source_kind}": F.lit(source_name),
            "_extraction_timestamp": F.current_timestamp(),
        }
    )
