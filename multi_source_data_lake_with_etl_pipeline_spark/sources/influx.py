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

import re
from collections.abc import Mapping, Sequence
from typing import Any, Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

POINT_BASE_COLS = ("time", "measurement", "field", "value")

_FLUX_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _fq(value: str) -> str:
    """Escape a value for interpolation inside a Flux double-quoted
    string literal — backslash first, then quote. Without this a value
    containing ``"`` breaks the query (or injects arbitrary Flux
    clauses, since the builder serves live-production readers via the
    extractor registry)."""
    return str(value).replace("\\", "\\\\").replace('"', '\\"')


def _flux_ident(name: str) -> str:
    """Tag KEYS are interpolated as bare ``r.<key>`` member accesses —
    no quoting context exists, so restrict to identifier charset and
    refuse anything else rather than emit malformed/injected Flux."""
    if not _FLUX_IDENT_RE.match(name):
        raise ValueError(f"invalid Flux tag key: {name!r}")
    return name


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
        f'from(bucket: "{_fq(bucket)}")\n'
        f"  |> range(start: {start}, stop: {stop})\n"
        f'  |> filter(fn: (r) => r._measurement == "{_fq(measurement)}")'
    )
    if fields:
        ors = " or ".join(f'r._field == "{_fq(f)}"' for f in fields)
        query += f"\n  |> filter(fn: (r) => {ors})"
    for k, v in (tags or {}).items():
        query += f'\n  |> filter(fn: (r) => r.{_flux_ident(k)} == "{_fq(v)}")'
    return query


def build_measurements_flux(bucket: str) -> str:
    """Schema introspection (influx_connector.py:229-248)."""
    return (
        'import "influxdata/influxdb/schema"\n'
        f'schema.measurements(bucket: "{_fq(bucket)}")'
    )


def build_fields_flux(bucket: str, measurement: str) -> str:
    """Field-key introspection (influx_connector.py:250-272)."""
    return (
        'import "influxdata/influxdb/schema"\n'
        "schema.measurementFieldKeys(\n"
        f'  bucket: "{_fq(bucket)}",\n'
        f'  measurement: "{_fq(measurement)}"\n'
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
    # Explicit schema, not inference: a column that is None in EVERY
    # record (a null field value, a tag key present only with nulls —
    # both legal Influx results) makes createDataFrame's inference
    # raise "Some of types cannot be determined". Type each column
    # from its first non-null value; all-null columns land as string.
    import datetime

    from pyspark.sql import types as T

    _PY2SPARK = [
        (bool, T.BooleanType()),  # before int: bool is an int subclass
        (datetime.datetime, T.TimestampType()),
        (datetime.date, T.DateType()),
        (int, T.LongType()),
        (float, T.DoubleType()),
        (str, T.StringType()),
    ]

    def _spark_type(c: str):
        seen = None
        for r in norm:
            v = r[c]
            if v is None:
                continue
            this = T.StringType()
            for py, st in _PY2SPARK:
                if isinstance(v, py):
                    this = st
                    break
            if seen is None:
                seen = this
            elif seen != this:
                # int/float mixes widen to double; anything else → string
                num = (T.LongType(), T.DoubleType())
                seen = T.DoubleType() if seen in num and this in num else T.StringType()
        return seen or T.StringType()

    schema = T.StructType([T.StructField(c, _spark_type(c), True) for c in cols])
    def _coerce(v, dt):
        if v is None:
            return None
        if isinstance(dt, T.StringType) and not isinstance(v, str):
            return str(v)
        if isinstance(dt, T.DoubleType) and isinstance(v, int):
            return float(v)
        return v

    rows = [tuple(_coerce(r[c], schema[c].dataType) for c in cols) for r in norm]
    return spark.createDataFrame(rows, schema)


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


_FLUX_DUR_RE = re.compile(r"(-?\d+)(s|m|h|d|w)\Z")
_FLUX_DUR_SECS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _time_bound(value: str) -> Column:
    """Compile a Flux-style time bound to a timestamp Column. The
    sibling ``influx_extract`` defaults to RELATIVE ranges
    (start='-1h', stop='now()'); casting those strings to timestamp
    throws under ANSI mode (CAST_INVALID_INPUT) or silently NULLs the
    predicate with ANSI off — so relative durations and now() compile
    to current_timestamp arithmetic, absolute strings cast as before.
    Still a foldable scalar, so the predicate stays pushdown-able."""
    if value == "now()":
        return F.current_timestamp()
    m = _FLUX_DUR_RE.match(value)
    if m:
        secs = int(m.group(1)) * _FLUX_DUR_SECS[m.group(2)]
        return F.current_timestamp() + F.expr(f"INTERVAL '{secs}' SECOND")
    return F.lit(value).cast("timestamp")


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
        out = out.filter(F.col(time_col) >= _time_bound(start))
    if stop is not None:
        out = out.filter(F.col(time_col) < _time_bound(stop))
    if fields:
        out = out.filter(F.col("field").isin(list(fields)))
    for k, v in (tags or {}).items():
        out = out.filter(F.col(k) == v)
    return out
