"""File scans (reference S4/S5: ``base_extractors.py:195-230``,
``common_utils.py:103-138``): CSV / JSON / JSONL / NDJSON / Parquet /
YAML, with format inference from the extension.

Spark-first: ``spark.read.*`` gives partitioned scans, predicate
pushdown and column pruning; the reference's pandas reads materialize
whole files in driver memory. YAML has no distributed reader — it's a
config format, read driver-side then parallelized (same as reference).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# extension → canonical format (base_extractors.py:206-216 dispatch)
_EXT_FORMAT = {
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "jsonl",
    ".ndjson": "jsonl",
    ".parquet": "parquet",
    ".yaml": "yaml",
    ".yml": "yaml",
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext not in _EXT_FORMAT:
        raise ValueError(f"cannot infer file format from {path!r}")
    return _EXT_FORMAT[ext]


def read_file(
    spark: SparkSession,
    path: str,
    file_format: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """S4/S5 file scan. ``multiLine`` JSON = the reference's
    whole-file ``json.load``; jsonl = line-delimited."""
    fmt = file_format or infer_format(path)
    if fmt == "csv":
        reader = spark.read.options(header=True, inferSchema=schema is None, **options)
        return reader.csv(path, schema=schema)
    if fmt == "json":
        return spark.read.options(multiLine=True, **options).json(path, schema=schema)
    if fmt == "jsonl":
        return spark.read.options(**options).json(path, schema=schema)
    if fmt == "parquet":
        return spark.read.options(**options).parquet(path)
    if fmt == "yaml":
        return _read_yaml(spark, path)
    raise ValueError(f"unsupported format: {fmt!r}")


def _read_yaml(spark: SparkSession, path: str) -> DataFrame:
    """YAML loader (common_utils.py:118-120): driver-side parse →
    createDataFrame. Full YAML via PyYAML when installed; without it
    the flat-subset codec (``sources/yamlite``) reads block sequences
    of scalar mappings — the shape this surface actually carries — and
    rejects anything richer loudly."""
    try:
        import yaml
    except ImportError:
        from . import yamlite

        with open(path) as fh:
            return spark.createDataFrame(yamlite.parse(fh.read()))
    with open(path) as fh:
        data = yaml.safe_load(fh)
    if isinstance(data, dict):
        data = [data]
    return spark.createDataFrame(data)


def validate_source(spark: SparkSession, path: str) -> bool:
    """S10 source-validation probe (``validate_source`` impls,
    base_extractors.py:86-94 etc.): existence/readability check."""
    return os.path.exists(path)
