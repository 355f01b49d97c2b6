"""Serving-tier tests: full HTTP round-trips against the reference's
endpoint surface (src/api/main.py:53-390), driven with urllib against
a background ThreadingHTTPServer on an ephemeral port."""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

import pytest

from multi_source_data_lake_with_etl_pipeline_spark.api import (
    DataLakeService,
    flux_relative,
    mongo_filter_to_column,
    serve_background,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def api(spark):
    service = DataLakeService(spark, SF_SMOKE)
    server, base = serve_background(service)
    yield base
    server.shutdown()


def _get(base: str, path: str, **params) -> tuple[int, dict]:
    url = base + path
    if params:
        url += "?" + urllib.parse.urlencode(params)
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def _post(base: str, path: str, payload: dict) -> tuple[int, dict]:
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as exc:
        return exc.code, json.loads(exc.read())


def test_info_endpoints(api):
    for path, key in [
        ("/", "message"),
        ("/health", "status"),
        ("/api/v1/status", "engine"),
        ("/api/v1/config", "etl_config"),
    ]:
        status, body = _get(api, path)
        assert status == 200 and key in body
    status, body = _get(api, "/api/v1/status")
    assert "orders" in body["catalog"]["tables"]


def test_query_table_where_and_limit(api):
    status, body = _get(
        api, "/api/v1/query/postgres",
        table="orders", limit=5, where="o_totalprice > 100000",
    )
    assert status == 200 and body["status"] == "success"
    assert body["count"] == 5 and len(body["data"]) == 5
    assert all(r["o_totalprice"] > 100000 for r in body["data"])
    # alias route serves the same persona
    status2, body2 = _get(api, "/api/v1/query/table", table="region", limit=100)
    assert status2 == 200 and body2["count"] == 5  # 5 regions total


def test_query_collection_filter_doc(api):
    fdoc = json.dumps({"o_orderstatus": "F", "o_totalprice": {"$gt": 150000.0}})
    status, body = _get(
        api, "/api/v1/query/mongodb",
        collection="orders", limit=50, filter=fdoc,
    )
    assert status == 200
    assert 0 < body["count"] <= 50
    assert all(
        r["o_orderstatus"] == "F" and r["o_totalprice"] > 150000.0 for r in body["data"]
    )


def test_query_measurement_absolute_range(api):
    status, body = _get(
        api, "/api/v1/query/influxdb",
        measurement="events",
        start="2024-01-10 00:00:00", stop="2024-01-11 00:00:00",
        fields="user_id,value",
    )
    assert status == 200 and body["count"] == len(body["data"]) > 0
    assert set(body["data"][0]) == {"ts", "user_id", "value"}
    assert all("2024-01-10" in r["ts"] for r in body["data"])


def test_flux_relative_parse():
    assert flux_relative("-1h") == "1 hour"
    assert flux_relative("-30m") == "30 minute"
    assert flux_relative("-7d") == "7 day"
    assert flux_relative("2024-01-01") is None


def test_mongo_filter_compiles_conjunction(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["x", "y"])
    pred = mongo_filter_to_column({"y": "a", "x": {"$gte": 2}})
    assert [r.x for r in df.filter(pred).collect()] == [2]
    with pytest.raises(ValueError):
        mongo_filter_to_column({"x": {"$regex": "a"}})


def test_etl_run_and_stats(api, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("api_etl") / "out.parquet")
    status, body = _post(
        api, "/api/v1/etl/run",
        {
            "source_type": "parquet_table",
            "source_config": {"sf_dir": SF_SMOKE, "table": "customer"},
            "target_type": "file",
            "target_config": {"path": out, "file_format": "parquet"},
            "transformations": [
                {"name": "filter", "params": {"predicate": "c_acctbal > 0"}},
                "cleaning",
            ],
        },
    )
    assert status == 200, body
    assert body["status"] == "success" and body["extracted_count"] > 0
    assert body["load_results"]["target"]["status"] == "success"
    # stats endpoint reflects the load we just did
    status, stats = _get(api, "/api/v1/stats/etl")
    assert status == 200 and stats["statistics"]["successful"] >= 1


def test_upload_roundtrip(api, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("api_upload") / "up.parquet")
    records = [{"id": i, "name": f"n{i}"} for i in range(10)]
    status, body = _post(
        api, "/api/v1/data/upload",
        {"data": records, "target_type": "file",
         "target_config": {"path": out, "file_format": "parquet"}},
    )
    assert status == 200 and body["uploaded_count"] == 10
    assert spark.read.parquet(out).count() == 10


def test_health_and_metadata(api):
    status, body = _get(api, "/api/v1/databases/health")
    assert status == 200 and body["overall_status"] == "healthy"
    assert body["databases"]["orders"]["status"] == "healthy"
    status, t = _get(api, "/api/v1/metadata/tables")
    status2, c = _get(api, "/api/v1/metadata/collections")
    status3, m = _get(api, "/api/v1/metadata/measurements")
    assert t["tables"] == c["collections"]
    assert "events" in m["measurements"] and "region" not in m["measurements"]


def test_error_envelopes(api):
    status, body = _get(api, "/api/v1/query/postgres", table="nope")
    assert status == 404 and "nope" in body["detail"]
    status, body = _get(api, "/api/v1/query/postgres")  # missing table param
    assert status == 400
    status, body = _get(api, "/api/v1/query/mongodb", collection="orders", filter="{bad")
    assert status == 400
    status, body = _get(api, "/no/such/route")
    assert status == 404
    status, body = _post(api, "/api/v1/etl/run", {"source_type": "bogus"})
    assert status == 500 and "bogus" in body["detail"]


def test_lake_endpoints(api, spark, tmp_path_factory):
    from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

    base = api
    root = tmp_path_factory.mktemp("lake_api")
    t = LakeTable.create(
        spark, str(root / "t"),
        spark.createDataFrame([(i, i * 2) for i in range(30)], "k long, v long"),
    )
    t.delete("k < 10")
    import urllib.parse

    def lake_get(route, **params):
        return _get(base, route + "?" + urllib.parse.urlencode(params))

    code, body = lake_get("/api/v1/lake/history", path=t.path)
    assert code == 200 and [h["op"] for h in body["history"]] == ["delete", "create"]
    code, body = lake_get("/api/v1/lake/query", path=t.path, limit=100)
    assert code == 200 and body["count"] == 20
    code, body = lake_get("/api/v1/lake/query", path=t.path, version=0, limit=100)
    assert body["count"] == 30  # time travel over HTTP
    code, body = lake_get("/api/v1/lake/query", path=t.path, where="k >= 25", limit=100)
    assert body["count"] == 5
    code, body = lake_get("/api/v1/lake/history", path="/nonexistent")
    assert code in (404, 500)


def test_sql_callable_udtf_lateral(spark):
    """SURVEY §2.11: table-function extension surface — per-row LATERAL
    expansion from plain SQL."""
    from multi_source_data_lake_with_etl_pipeline_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a b c d"), (2, "x y"), (3, None)], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs_v")
    rows = spark.sql(
        "SELECT d.doc_id, g.pos, g.gram "
        "FROM udtf_docs_v d, LATERAL ngram_windows(d.text, 3) g "
        "ORDER BY doc_id, pos"
    ).collect()
    assert [tuple(r) for r in rows] == [(1, 0, "a b c"), (1, 1, "b c d")]
