"""REST endpoints as a Spark DataSource (Python Data Source API,
Spark 4): ``spark.read.format("restapi")``.

Third formulation of the reference's S6 API scan, alongside the
driver-side ``rest_api`` (reference parity,
``base_extractors.py:245-275``) and the ``mapInPandas`` fan-out
(``rest.py``). Registering the fetch AS A DATASOURCE moves it behind
the DataFrame reader boundary: one ``InputPartition`` per URL, so the
scheduler owns parallelism/retries like any file scan, downstream ops
compose without knowing rows came from HTTP, and the source is usable
from pure-SQL surfaces.

Output schema is the same contract as ``rest.py``: one row per
unwrapped record, ``(url, record json-string, error)`` — errors are
ROWS (a dead endpoint must not kill a 10k-endpoint ingest); the typed
parse happens JVM-side via ``from_json`` (``parsed_records``).

Options: ``urls`` (comma- or newline-separated), ``timeout`` seconds.
Fetching uses stdlib urllib on the executors — no extra worker deps.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .rest import unwrap_envelope

_SCHEMA = "url string, record string, error string"


class RestApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "restapi"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> "RestApiReader":
        return RestApiReader(self.options)


class RestApiReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("urls", "")
        self.urls = [u.strip() for u in re.split(r"[,\n]", raw) if u.strip()]
        if not self.urls:
            raise ValueError("restapi source requires a non-empty 'urls' option")
        self.timeout = int(options.get("timeout", "30"))

    def partitions(self):
        # One URL per partition: latency-bound work wants the widest
        # possible spread, and the scheduler can pipeline thousands of
        # single-URL tasks across whatever cores exist.
        return [InputPartition(u) for u in self.urls]

    def read(self, partition):
        import urllib.request

        url = partition.value
        try:
            with urllib.request.urlopen(url, timeout=self.timeout) as resp:  # noqa: S310
                payload = resp.read()
            for rec in unwrap_envelope(json.loads(payload)):
                yield (url, json.dumps(rec), None)
        except Exception as exc:  # noqa: BLE001 — error-as-row (V6)
            yield (url, None, f"{type(exc).__name__}: {exc}")


def register_rest_datasource(spark) -> None:
    """Idempotent registration of the ``restapi`` format."""
    spark.dataSource.register(RestApiDataSource)


def parsed_records(raw: DataFrame, schema: str) -> DataFrame:
    """Typed view of a restapi scan: JVM-side from_json of the record
    column against the caller's DDL schema, fetch errors preserved."""
    return raw.select(
        "url",
        F.from_json("record", schema).alias("rec"),
        F.col("error").alias("_fetch_error"),
    ).select("url", "rec.*", "_fetch_error")
