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


# ---------------------------------------------------------------- T4
# Streaming Python Data Source: a deterministic sensor-feed replay —
# the MQTT/OPC-UA stand-in for the reference's streaming configs
# (reference ships config-only, no broker impl; SURVEY §2.10 T4). A
# real broker client would implement the same two methods (read() =
# poll, readBetweenOffsets() = replay from the persisted offset log);
# here the topic is a bounded deterministic tick sequence so the feed
# is exactly reproducible — and therefore SQL-oracle-able end to end.
#
# Offsets are {"i": next_seq}: monotone, replayable, checkpoint-owned.
# Exactly-once downstream = Structured Streaming's usual contract
# (offset log + idempotent sink); tests/test_streaming drains the feed
# across TWO availableNow restarts sharing one checkpoint and asserts
# no row is lost or duplicated.

_FEED_SCHEMA = "seq long, sensor string, value_c long"


def _feed_rows(start: int, end: int, n_sensors: int):
    # exact integer tick payload: engine-independent, no floats
    return [
        (j, f"sensor{j % n_sensors}", (j * 37) % 1000) for j in range(start, end)
    ]


class SensorFeedDataSource(DataSource):
    """``spark.readStream.format("sensorfeed")`` — options:
    ``n_rows`` (topic size, default 100), ``batch_rows`` (max rows per
    micro-batch, default all remaining), ``n_sensors`` (default 4)."""

    @classmethod
    def name(cls) -> str:
        return "sensorfeed"

    def schema(self) -> str:
        return _FEED_SCHEMA

    def simpleStreamReader(self, schema):
        from pyspark.sql.datasource import SimpleDataSourceStreamReader

        n_rows = int(self.options.get("n_rows", 100))
        batch_rows = int(self.options.get("batch_rows", n_rows))
        n_sensors = int(self.options.get("n_sensors", 4))

        class _Reader(SimpleDataSourceStreamReader):
            def initialOffset(self):
                return {"i": 0}

            def read(self, start):
                i = int(start["i"])
                if i >= n_rows:
                    return iter([]), {"i": i}
                end = min(i + batch_rows, n_rows)
                return iter(_feed_rows(i, end, n_sensors)), {"i": end}

            def readBetweenOffsets(self, start, end):
                return iter(_feed_rows(int(start["i"]), int(end["i"]), n_sensors))

        return _Reader()


def register_sensorfeed_datasource(spark) -> None:
    """Idempotent registration of the ``sensorfeed`` format."""
    spark.dataSource.register(SensorFeedDataSource)
