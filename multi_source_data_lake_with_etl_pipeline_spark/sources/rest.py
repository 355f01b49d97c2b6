"""Partition-parallel REST ingestion (S6 scale path, SURVEY §2.1).

The reference's API extractor is a driver-side single fetch
(``base_extractors.py:245-275`` — kept as ``rest_api`` in the
registry). At scale the endpoint list IS data: a URL-list DataFrame is
fanned out with Arrow-batched ``mapInPandas`` so every executor core
fetches its own shard of endpoints concurrently.

Division of labor: Python workers do ONLY the I/O + envelope unwrap
and emit one JSON string per record; the typed parse happens JVM-side
with ``from_json`` against the caller's schema (or a schema sampled
from the first rows). Failures become rows (url, error) instead of
task aborts — a dead endpoint must not kill a 10k-endpoint ingest.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_FETCH_SCHEMA = "url string, record string, error string"


def _default_fetch(url: str, timeout: int) -> bytes:
    import urllib.request

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # noqa: S310
        return resp.read()


def unwrap_envelope(data):
    """data/results/items envelope → list of records (reference
    ``base_extractors.py:255-262``)."""
    if isinstance(data, dict):
        for key in ("data", "results", "items"):
            if key in data and isinstance(data[key], list):
                return data[key]
        return [data]
    return data if isinstance(data, list) else [data]


def fetch_urls(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    timeout: int = 30,
    fetch_fn: Callable[[str, int], bytes] | None = None,
) -> DataFrame:
    """URL list → (url, record, error) rows, one per unwrapped record,
    fetched in parallel across executors. ``fetch_fn`` is pluggable for
    tests / auth wrappers; the default is stdlib urllib (no extra deps
    on workers)."""
    if isinstance(urls, DataFrame):
        url_df = urls.select(F.col(urls.columns[0]).cast("string").alias("url"))
    else:
        url_df = spark.createDataFrame([(u,) for u in urls], "url string")
    # One URL per partition up to defaultParallelism: fetch latency, not
    # CPU, dominates — spread endpoints as widely as possible.
    n = url_df.count()
    target = min(max(n, 1), spark.sparkContext.defaultParallelism)
    url_df = url_df.repartition(target)
    fetch = fetch_fn or _default_fetch

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: list[tuple[str, str | None, str | None]] = []
            for url in pdf["url"]:
                try:
                    payload = fetch(url, timeout)
                    for rec in unwrap_envelope(json.loads(payload)):
                        out.append((url, json.dumps(rec), None))
                except Exception as exc:  # noqa: BLE001 — error-as-row (V6)
                    out.append((url, None, f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(out, columns=["url", "record", "error"])

    return url_df.mapInPandas(run, schema=_FETCH_SCHEMA)


def rest_api_parallel(
    spark: SparkSession,
    urls: list[str] | DataFrame,
    schema: str | None = None,
    timeout: int = 30,
    fetch_fn: Callable[[str, int], bytes] | None = None,
) -> DataFrame:
    """S6 at scale: parallel fetch + envelope unwrap + typed JVM-side
    parse. ``schema`` is a DDL string for the record struct; when
    omitted it is inferred from a sample of fetched records (one extra
    driver pass — pass a schema in production). Fetch errors surface as
    rows with NULL record columns plus ``_fetch_error``."""
    raw = fetch_urls(spark, urls, timeout=timeout, fetch_fn=fetch_fn).persist()
    if schema is None:
        sample = [r["record"] for r in raw.filter(F.col("record").isNotNull()).limit(100).collect()]
        if not sample:
            return raw.select("url", F.col("error").alias("_fetch_error"))
        schema = spark.range(1).select(
            F.schema_of_json(F.lit(json.dumps([json.loads(s) for s in sample])))
        ).collect()[0][0].removeprefix("ARRAY<").removesuffix(">")
    parsed = raw.select(
        "url",
        F.from_json("record", schema).alias("_rec"),
        F.col("error").alias("_fetch_error"),
    )
    return parsed.select("url", "_rec.*", "_fetch_error")
