"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference multi-source data-lake ETL system.

The reference (see SURVEY.md) is a record-at-a-time Python ETL
orchestrator: extract (Postgres/Mongo/Influx/files/REST) → per-record
transform chain (clean/validate/enrich/normalize/aggregate/dedup) →
routed load. This package re-expresses that entire capability surface
as lazy DataFrame plans so Catalyst supplies planning/optimization and
Tungsten/whole-stage-codegen supply execution:

- ``session``    — SparkSession factory (AQE on, UTC, tuned shuffle).
- ``catalog``    — lake-table registry over parquet zones.
- ``sources``    — readers (parquet/csv/json/jsonl/ndjson/yaml, REST).
- ``sinks``      — writers, routing/fan-out, merge/upsert, deletes.
- ``operators``  — cleaning, validation, quality, enrichment,
                   normalization, aggregation, dedup, joins, set ops,
                   time-series ops: all ``DataFrame -> DataFrame``.
- ``functions``  — scalar column expressions (phone/email/date/hash…).
- ``plans``      — declarative job spec → one lazy plan.
- ``streaming``  — Structured Streaming ingestion + windowed aggs.
- ``llm_ops``    — training-data-pipeline ops: dedup (exact/MinHash/
                   SimHash/n-gram), similarity search, text analysis,
                   multimodal plumbing.
"""

__version__ = "0.1.0"
