"""Influx/Flux federation extractor (reference S3 live path,
``influx_connector.py:142-189`` query building, ``229-272`` schema
introspection) — closes the federation trio next to ``sources/jdbc.py``
(S1) and ``sources/mongo.py`` (S2).

Two surfaces, mirroring how the JDBC shim splits "option mapping"
from "execution":

- ``build_flux_query`` / ``build_measurements_flux`` /
  ``build_fields_flux`` — pure builders producing the exact Flux the
  reference's ``query_range`` / ``get_measurements`` / ``get_fields``
  assemble (range → measurement filter → field-OR filter → tag
  filters). Unit-testable with no client.
- ``influx_extract`` — executes a built query through an injectable
  ``reader`` (no influxdb client ships in this container; the real
  client returns long-format records which ``records_to_df`` lifts
  into a DataFrame). Without a reader it requires ``influxdb_client``
  and raises ``NotImplementedError`` otherwise, like the YAML writer.

The LAKE-side equivalent of the same scan semantics is
``influx_lake_scan``: measurement/range/field/tag params compile to
Column predicates on a long-format points table, so Catalyst pushes
them into the parquet scan (PushedFilters) — the 100 TB path reads
only the probed time range and tags, never the full series history.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINT_BASE_COLS = ("time", "measurement", "field", "value")


def build_flux_query(
    bucket: str,
    measurement: str,
    start: str = "-1h",
    stop: str = "now()",
    fields: Sequence[str] | None = None,
    tags: Mapping[str, str] | None = None,
) -> str:
    """Flux builder matching ``influx_connector.query_range``
    (influx_connector.py:148-162): range → measurement filter →
    OR-joined field filter → one filter per tag."""
    query = (
        f'from(bucket: "{bucket}")\n'
        f"  |> range(start: {start}, stop: {stop})\n"
        f'  |> filter(fn: (r) => r._measurement == "{measurement}")'
    )
    if fields:
        ors = " or ".join(f'r._field == "{f}"' for f in fields)
        query += f"\n  |> filter(fn: (r) => {ors})"
    for k, v in (tags or {}).items():
        query += f'\n  |> filter(fn: (r) => r.{k} == "{v}")'
    return query


def build_measurements_flux(bucket: str) -> str:
    """Schema introspection (influx_connector.py:229-248)."""
    return (
        'import "influxdata/influxdb/schema"\n'
        f'schema.measurements(bucket: "{bucket}")'
    )


def build_fields_flux(bucket: str, measurement: str) -> str:
    """Field-key introspection (influx_connector.py:250-272)."""
    return (
        'import "influxdata/influxdb/schema"\n'
        "schema.measurementFieldKeys(\n"
        f'  bucket: "{bucket}",\n'
        f'  measurement: "{measurement}"\n'
        ")"
    )


def records_to_df(spark: SparkSession, records: list[dict[str, Any]]) -> DataFrame:
    """Lift the client's long-format records (time/measurement/field/
    value + tag columns, influx_connector.py:168-184) into a DataFrame.
    Tag columns are whatever extra keys appear — schema unions across
    records like the reference's row dicts."""
    if not records:
        return spark.createDataFrame(
            [], "time timestamp, measurement string, field string, value double"
        )
    cols: list[str] = []
    for r in records:
        for k in r:
            if k not in cols:
                cols.append(k)
    norm = [{c: r.get(c) for c in cols} for r in records]
    return spark.createDataFrame(norm)


def influx_extract(
    spark: SparkSession,
    bucket: str,
    measurement: str,
    start: str = "-1h",
    stop: str = "now()",
    fields: Sequence[str] | None = None,
    tags: Mapping[str, str] | None = None,
    url: str | None = None,
    token: str | None = None,
    org: str | None = None,
    reader: Callable[[str], Any] | None = None,
) -> DataFrame:
    """S3 extractor: build the Flux, execute it, return a DataFrame.

    ``reader(flux) -> list[dict] | DataFrame`` injects a fake in tests
    and any custom client in production. Without one, the real
    ``influxdb_client`` is required (absent in this container)."""
    flux = build_flux_query(bucket, measurement, start, stop, fields, tags)
    if reader is not None:
        out = reader(flux)
        return out if isinstance(out, DataFrame) else records_to_df(spark, out)
    try:
        from influxdb_client import InfluxDBClient  # noqa: F401
    except ImportError as exc:  # pragma: no cover — no client in container
        raise NotImplementedError(
            "influxdb_client not installed; pass reader= to influx_extract"
        ) from exc
    client = InfluxDBClient(url=url, token=token, org=org)  # pragma: no cover
    tables = client.query_api().query(flux)  # pragma: no cover
    records = [  # pragma: no cover — mirrors influx_connector.py:168-184
        {
            "time": rec.get_time(),
            "measurement": rec.get_measurement(),
            "field": rec.get_field(),
            "value": rec.get_value(),
            **{
                k: v
                for k, v in rec.values.items()
                if not k.startswith("_")
                and k not in ("result", "table", "measurement", "field", "value", "time")
            },
        }
        for table in tables
        for rec in table.records
    ]
    return records_to_df(spark, records)  # pragma: no cover


def influx_lake_scan(
    df: DataFrame,
    measurement: str | None = None,
    start: str | None = None,
    stop: str | None = None,
    fields: Sequence[str] | None = None,
    tags: Mapping[str, str] | None = None,
    time_col: str = "time",
) -> DataFrame:
    """The same range/measurement/field/tag semantics compiled onto a
    LAKE points table (long format, see ``operators.timeseries
    .to_points``): every clause is a Column predicate, so the filters
    reach the parquet scan as PushedFilters and a partition-pruned
    layout (partitionBy date/measurement) reads only the probed
    slices. This is what a 100 TB time-series read must look like —
    the federation path above is for LIVE InfluxDB interop."""
    out = df
    if measurement is not None:
        out = out.filter(F.col("measurement") == measurement)
    if start is not None:
        out = out.filter(F.col(time_col) >= F.lit(start).cast("timestamp"))
    if stop is not None:
        out = out.filter(F.col(time_col) < F.lit(stop).cast("timestamp"))
    if fields:
        out = out.filter(F.col("field").isin(list(fields)))
    for k, v in (tags or {}).items():
        out = out.filter(F.col(k) == v)
    return out
