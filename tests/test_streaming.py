"""Structured Streaming: file source → watermark/windows/dedup →
availableNow → memory sink, checked against batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table
from multi_source_data_lake_with_etl_pipeline_spark.operators.timeseries import (
    sessionize,
    tumbling,
)
from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
    read_events_stream,
    run_to_memory_sink,
    stream_dedup,
    stream_session_agg,
    stream_tumbling_agg,
    write_stream_parquet,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Stage the events table as a parquet directory (micro-batch
    source); ts is nanos in the source so route through catalog."""
    path = str(tmp_path_factory.mktemp("events_stream") / "events")
    load_table(spark, sf_dir, "events").write.parquet(path)
    return path


def test_stream_tumbling_matches_batch(spark, events_dir, sf_dir):
    stream = read_events_stream(spark, events_dir)
    agg = stream_tumbling_agg(stream, "1 hour", watermark="10 minutes")
    run_to_memory_sink(agg, "tumbling_test")
    got = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], r["value_sum"])
        for r in spark.table("tumbling_test").collect()
    }
    batch = tumbling(
        load_table(spark, sf_dir, "events"), "ts", "1 hour", keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("event_cnt"),
              F.round(F.sum("value"), 2).alias("value_sum")],
    )
    want = {
        (r["window_start"], r["event_type"]): (r["event_cnt"], r["value_sum"])
        for r in batch.collect()
    }
    # Append-mode watermarked aggs emit only CLOSED windows: the last
    # window(s) stay in state at end-of-stream. Emitted values must
    # match batch exactly; anything missing must be the open tail.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"
    max_ts = load_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    import datetime

    wm = max_ts - datetime.timedelta(minutes=10)
    missing = set(want) - set(got)
    for ws, _ in missing:
        assert ws + datetime.timedelta(hours=1) >= wm, f"closed window {ws} not emitted"


def test_stream_sessionize_matches_batch(spark, events_dir, sf_dir):
    stream = read_events_stream(spark, events_dir)
    agg = stream_session_agg(stream, gap="1 hour", watermark="10 minutes")
    run_to_memory_sink(agg, "session_test")
    got = {
        (r["user_id"], r["session_start"]): r["event_cnt"]
        for r in spark.table("session_test").collect()
    }
    batch = sessionize(
        load_table(spark, sf_dir, "events"), "ts", "1 hour", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("event_cnt")],
    )
    want = {
        (r["user_id"], r["session_start"]): r["event_cnt"] for r in batch.collect()
    }
    # Same closed-window semantics as tumbling: emitted sessions match
    # batch exactly; only watermark-open sessions may be missing.
    assert got, "stream emitted nothing"
    for k, v in got.items():
        assert want[k] == v, f"session {k}: stream {v} != batch {want[k]}"
    assert len(set(want) - set(got)) <= len(
        {u for u, _ in want}
    ), "more sessions missing than one open session per user"


def test_stream_dedup_drops_duplicates(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    # duplicate the stream by unioning with itself → dedup must halve it
    doubled = stream.unionByName(stream)
    deduped = stream_dedup(doubled, keys=["event_id"], watermark="365 days")
    run_to_memory_sink(deduped, "dedup_test")
    n = spark.table("dedup_test").count()
    base = spark.read.parquet(events_dir).count()
    assert n == base


def test_stream_parquet_sink(spark, events_dir, tmp_path):
    stream = read_events_stream(spark, events_dir)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    write_stream_parquet(
        stream.filter(F.col("event_type") == "purchase"), out, ckpt
    )
    written = spark.read.parquet(out)
    assert written.count() == spark.read.parquet(events_dir).filter(
        F.col("event_type") == "purchase"
    ).count()


def test_stream_running_totals_matches_batch(spark, events_dir):
    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        read_events_stream,
        run_to_memory_sink,
        stream_running_totals,
    )

    stream = read_events_stream(spark, events_dir)
    totals = stream_running_totals(stream)
    run_to_memory_sink(totals, "running_totals_q", output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.table("running_totals_q").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        r["user_id"]: (r["n"], r["t"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 2).alias("t"),
        )
        .collect()
    }
    assert got == want
