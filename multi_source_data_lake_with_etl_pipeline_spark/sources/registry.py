"""Extractor registry (reference U3 pluggable extractor ABCs,
``base_extractors.py:22-38``; API source-type dispatch
``src/api/main.py:229-240``).

An extractor is any ``(spark, **config) -> DataFrame`` callable keyed
by source type. Built-ins: file, parquet_table, sql, rest_api,
rest_api_parallel (S6 scale path), jdbc (S1 federation), mongodb
(S2/S8 federation via the DSv2 connector's option surface), influx
(S3 federation via the Flux query builder + injectable reader — no
public Spark connector exists, so live reads go through the client
shim while lake-side range scans use influx_lake_scan / the
timeseries operators; live servers are out of scope for the
parquet-lake test harness, SURVEY.md §4.3.4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from .files import read_file
from .influx import influx_extract
from .jdbc import jdbc_extract
from .mongo import mongo_extract
from .rest import rest_api_parallel


class ExtractorRegistry:
    def __init__(self):
        self._extractors: dict[str, Callable[..., DataFrame]] = {}
        self.register("file", lambda spark, **cfg: read_file(spark, **cfg))
        self.register(
            "parquet_table",
            lambda spark, sf_dir, table, **_: load_table(spark, sf_dir, table),
        )
        self.register("sql", lambda spark, query, **_: spark.sql(query))
        self.register("rest_api", _rest_api_extract)
        self.register("rest_api_parallel", rest_api_parallel)
        self.register("jdbc", jdbc_extract)
        self.register("mongodb", mongo_extract)
        self.register("influx", influx_extract)

    def register(self, source_type: str, fn: Callable[..., DataFrame]) -> None:
        self._extractors[source_type] = fn

    def extract(self, spark: SparkSession, source_type: str, **config) -> DataFrame:
        if source_type not in self._extractors:
            raise ValueError(
                f"unknown source type {source_type!r}; known: {sorted(self._extractors)}"
            )
        return self._extractors[source_type](spark, **config)


def _rest_api_extract(
    spark: SparkSession, url: str, headers: dict | None = None,
    params: dict | None = None, timeout: int = 30, **_,
) -> DataFrame:
    """S6 REST scan (base_extractors.py:245-275): GET → JSON → unwrap
    data/results/items envelope → DataFrame. Driver-side fetch (the
    reference is too); gated behind a requests import-try."""
    try:
        import requests
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("requests not installed; REST extraction unavailable") from exc
    resp = requests.get(url, headers=headers, params=params, timeout=timeout)
    resp.raise_for_status()
    data = resp.json()
    if isinstance(data, dict):  # envelope unwrap (:255-262)
        for key in ("data", "results", "items"):
            if key in data and isinstance(data[key], list):
                data = data[key]
                break
        else:
            data = [data]
    return spark.createDataFrame(data)
