"""Structured Streaming: file source → watermark/windows/dedup →
availableNow → memory sink, checked against batch equivalents."""

from __future__ import annotations

import json

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


def test_transform_with_state_matches_legacy_stateful(spark, events_dir):
    """The Spark 4 transformWithState formulation must produce the
    same per-user totals as applyInPandasWithState and the batch
    aggregate (RocksDB state store, as required by the new API).

    transformWithState's Python state server speaks protobuf; skipped
    where protobuf isn't installed (this container — the operator is
    still import-clean and plan-buildable)."""
    pytest.importorskip(
        "google.protobuf", reason="transformWithState state server needs protobuf"
    )
    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        read_events_stream,
        run_to_memory_sink,
        stream_running_totals_tws,
        use_rocksdb_state,
    )

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    use_rocksdb_state(spark)
    try:
        stream = read_events_stream(spark, events_dir)
        totals = stream_running_totals_tws(stream)
        run_to_memory_sink(totals, "running_totals_tws_q", output_mode="update")
        got = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.table("running_totals_tws_q").collect()
        }
    finally:
        if old is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
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


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data handling: after a checkpointed run advances the
    watermark, a later run sees an event older than the watermark and
    drops it — the closed window is neither re-emitted nor updated."""
    import datetime as dt
    import os

    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        read_events_stream,
        stream_tumbling_agg,
    )

    src_dir = tmp_path / "late_src"
    cp = str(tmp_path / "cp")
    os.makedirs(src_dir)

    def add_file(name, rows):
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        import shutil

        for f in os.listdir(tmp_path / name):
            if f.endswith(".parquet"):
                shutil.copy(tmp_path / name / f, src_dir / f"{name}.parquet")

    out_dir = str(tmp_path / "agg_out")

    def run():
        # Parquet sink: the one append sink that supports checkpoint
        # recovery (memory sink refuses to resume).
        agg = stream_tumbling_agg(
            read_events_stream(spark, str(src_dir)), "1 hour", watermark="10 minutes"
        )
        q_ = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", cp)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q_.awaitTermination(120)
        return spark.read.parquet(out_dir).collect()

    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    # Run 1: hours 0 and 5 → watermark commits at 4:50; hour-0 window
    # (end 1:00 < 4:50) closes and is emitted.
    add_file("b1", [(1, t(0, 30), 1, "x", 1.0, None), (2, t(5, 0), 1, "x", 1.0, None)])
    out1 = {r["window_start"].hour: r["value_sum"] for r in run()}
    assert out1.get(0) == 1.0

    # Run 2 (same checkpoint): a 100.0-value event at 0:45 is now LATE
    # (0:45 < watermark 4:50) → dropped; hour-0 must not re-emit or
    # absorb the late value anywhere in the committed output.
    add_file("b2", [(3, t(0, 45), 1, "x", 100.0, None), (4, t(6, 0), 1, "x", 1.0, None)])
    out2 = run()
    hour0 = [r for r in out2 if r["window_start"].hour == 0]
    assert len(hour0) == 1 and hour0[0]["value_sum"] == 1.0
    assert all(r["value_sum"] < 100.0 for r in out2)


def test_stream_merge_upsert_incremental_runs(spark, tmp_path):
    """Two availableNow runs over a growing source dir, one checkpoint:
    run 2 reads ONLY the new file (checkpoint-driven incremental) and
    MERGEs it — updated keys overwritten, untouched rows intact."""
    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        stream_merge_upsert,
    )

    src = tmp_path / "src"
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    schema = "k long, v string, seq long"

    # initial table
    spark.createDataFrame(
        [(1, "init1", 0), (2, "init2", 0)], schema
    ).write.parquet(tbl)

    def run():
        stream = (
            spark.readStream.schema(schema).parquet(str(src))
        )
        stream_merge_upsert(stream, tbl, key="k", checkpoint=ckpt, order_col="seq")

    src.mkdir()
    # batch 1: update k=2 (two competing rows — seq 2 must win), insert k=3
    spark.createDataFrame(
        [(2, "old", 1), (2, "new", 2), (3, "ins", 1)], schema
    ).coalesce(1).write.mode("append").parquet(str(src))
    run()
    got = {r.k: r.v for r in spark.read.parquet(tbl).collect()}
    assert got == {1: "init1", 2: "new", 3: "ins"}

    # batch 2 (same checkpoint): only the new file is processed
    spark.createDataFrame([(3, "upd", 3), (4, "ins4", 1)], schema).coalesce(
        1
    ).write.mode("append").parquet(str(src))
    run()
    got = {r.k: r.v for r in spark.read.parquet(tbl).collect()}
    assert got == {1: "init1", 2: "new", 3: "upd", 4: "ins4"}


def test_incremental_read_watermark_advances(spark, tmp_path):
    from multi_source_data_lake_with_etl_pipeline_spark.sources.incremental import (
        commit_watermark,
        incremental_read,
        read_watermark,
    )

    tbl = str(tmp_path / "t")
    state = str(tmp_path / "wm.json")
    spark.sql(
        "SELECT * FROM VALUES (1, timestamp'2024-01-01 10:00:00'),"
        " (2, timestamp'2024-01-01 11:00:00') AS t(id, ts)"
    ).write.parquet(tbl)

    # run 1: everything
    batch1 = incremental_read(spark.read.parquet(tbl), "ts", state)
    assert {r.id for r in batch1.collect()} == {1, 2}
    assert commit_watermark(batch1, "ts", state) == "2024-01-01 11:00:00"

    # append newer + older-duplicate rows; run 2 sees ONLY strictly-newer
    spark.sql(
        "SELECT * FROM VALUES (3, timestamp'2024-01-01 12:00:00'),"
        " (4, timestamp'2024-01-01 10:30:00') AS t(id, ts)"
    ).write.mode("append").parquet(tbl)
    batch2 = incremental_read(spark.read.parquet(tbl), "ts", state)
    assert {r.id for r in batch2.collect()} == {3}
    commit_watermark(batch2, "ts", state)
    assert read_watermark(state) == "2024-01-01 12:00:00"

    # empty batch: watermark unchanged, commit is a no-op
    batch3 = incremental_read(spark.read.parquet(tbl), "ts", state)
    assert batch3.count() == 0
    assert commit_watermark(batch3, "ts", state) is None
    assert read_watermark(state) == "2024-01-01 12:00:00"


def test_stream_interval_join_matches_across_micro_batches(spark, tmp_path):
    """Purchases arrive in file 1, their clicks in file 2; with
    maxFilesPerTrigger=1 the match spans two micro-batches — buffered
    join state (bounded by watermark + interval) must produce it."""
    from multi_source_data_lake_with_etl_pipeline_spark.streaming.ingest import (
        read_events_stream,
        run_to_memory_sink,
        stream_interval_join,
    )

    src = tmp_path / "ev"
    src.mkdir()
    raw = "event_id long, user_id long, event_type string, ts_s string"

    def write(rows):
        (
            spark.createDataFrame(rows, raw)
            .select("event_id", "user_id", "event_type", F.col("ts_s").cast("timestamp").alias("ts"))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )

    write([(1, 7, "purchase", "2024-01-01 10:00:00")])
    write(
        [
            (2, 7, "click", "2024-01-01 10:10:00"),   # in window
            (3, 7, "click", "2024-01-01 11:10:00"),   # outside 30 min
            (4, 8, "click", "2024-01-01 10:05:00"),   # other user
        ]
    )

    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    joined = stream_interval_join(
        stream.filter(F.col("event_type") == "purchase"),
        stream.filter(F.col("event_type") == "click"),
        key="user_id",
        upper_bound="30 minutes",
        prefixes=("p_", "c_"),
    ).select("p_event_id", "c_event_id")
    run_to_memory_sink(joined, "xbatch_join_q", state_partitions=2)
    rows = {(r.p_event_id, r.c_event_id) for r in spark.table("xbatch_join_q").collect()}
    assert rows == {(1, 2)}


def test_sensorfeed_offset_continuation_exactly_once(spark, tmp_path):
    """The Python streaming data source (MQTT stand-in) must resume
    from the checkpointed offset across availableNow restarts: three
    runs with batch_rows=40 drain a 120-row topic with no loss and no
    duplication (offset log + file sink = exactly-once)."""
    from multi_source_data_lake_with_etl_pipeline_spark.sources.pyds import (
        register_sensorfeed_datasource,
    )

    register_sensorfeed_datasource(spark)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for _ in range(3):
        q = (
            spark.readStream.format("sensorfeed")
            .option("n_rows", "120")
            .option("batch_rows", "40")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 120
    assert got.select("seq").distinct().count() == 120
    assert got.agg({"seq": "max"}).collect()[0][0] == 119
    # a fourth run sees an exhausted topic and adds nothing
    q = (
        spark.readStream.format("sensorfeed")
        .option("n_rows", "120")
        .option("batch_rows", "40")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 120


# ===================================================================
# Lake CDF as a streaming SOURCE (round 8): checkpoint-owned version
# cursor, one InputPartition per change-carrying file, exactly-once
# across availableNow restarts, full changes() parity.
class TestLakeCdfStreamSource:
    def _drain(self, spark, path, out, ckpt, from_version=-1):
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_cdf_stream,
        )

        q = (
            lake_cdf_stream(spark, path, from_version)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def test_exactly_once_restarts_match_batch_changes(self, spark, tmp_path):
        """Two drains sharing a checkpoint consume each commit exactly
        once; the union equals batch changes(-1) row-for-row (insert /
        update pre+post / delete, DV-aware), and an idle third drain
        adds nothing."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long"),
        )
        t.merge(spark.createDataFrame([(2, 99), (7, 70)], "k long, v long"), "k")
        t.delete("k = 1")
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck)
        assert spark.read.parquet(out).count() == 7
        t.append(spark.createDataFrame([(8, 80)], "k long, v long"))
        t.update("k = 3", {"v": "333"}, dv=True)
        self._drain(spark, t.path, out, ck)
        got = sorted(
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in spark.read.parquet(out).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in t.changes(-1).collect()
        )
        assert got == want
        self._drain(spark, t.path, out, ck)  # exhausted: no-op
        assert spark.read.parquet(out).count() == len(want)

    def test_partitioned_renamed_table_streams_current_names(
        self, spark, tmp_path
    ):
        """Composition: a PARTITIONED table renamed mid-history streams
        its feed under the CURRENT logical names with partition values
        filled from the hive directories (typed constants)."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame(
                [(1, 0, 10), (2, 1, 20)], "k long, p long, v long"
            ),
            partition_by=["p"],
        )
        t.rename_column("v", "val")
        t.append(spark.createDataFrame([(3, 0, 30)], "k long, p long, val long"))
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck)
        got = sorted(
            (r["k"], r["p"], r["val"], r["_change_type"])
            for r in spark.read.parquet(out).collect()
        )
        assert got == [
            (1, 0, 10, "insert"), (2, 1, 20, "insert"), (3, 0, 30, "insert")
        ]

    def test_generated_columns_stream_in_prebirth_files(self, spark, tmp_path):
        """Round 9: a generated column added AFTER files existed streams
        its recomputed VALUE for those pre-birth files (not NULL) — the
        wrapper's coalesce projection gives batch changes() parity,
        composed with a rename of the source column."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        )
        t.rename_column("v", "val")
        t.add_generated_column("val2", "val * 2")
        t.append(spark.createDataFrame([(3, 30)], "k long, val long"))
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck)
        got = sorted(
            (r["k"], r["val"], r["val2"], r["_change_type"], r["_commit_version"])
            for r in spark.read.parquet(out).collect()
        )
        want = sorted(
            (r["k"], r["val"], r["val2"], r["_change_type"], r["_commit_version"])
            for r in t.changes(-1).collect()
        )
        assert got == want
        assert all(v2 == val * 2 for _, val, v2, _, _ in got)

    def test_rate_limited_batches_cover_feed_exactly_once(
        self, spark, tmp_path
    ):
        """Round 9 (maxFilesPerTrigger parity at commit granularity):
        max_versions_per_batch=2 splits a 6-commit backfill into
        micro-batches of <=2 versions each; the union across batches is
        exactly changes(-1) — no duplicates, offsets exact."""
        import time as _time

        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_cdf_stream,
        )

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], "k long, v long"),
        )
        for i in range(1, 6):  # 6 commits total (create + 5 appends)
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
        batches: list[tuple[int, list[int]]] = []

        def sink(batch, batch_id):
            vs = sorted(
                r["_commit_version"]
                for r in batch.select("_commit_version").collect()
            )
            if vs:
                batches.append((batch_id, vs))

        q = (
            lake_cdf_stream(spark, t.path, max_versions_per_batch=2)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                if sum(len(vs) for _, vs in batches) >= 6:
                    break
                _time.sleep(0.5)
        finally:
            q.stop()
        got = [v for _, vs in batches for v in vs]
        assert sorted(got) == [0, 1, 2, 3, 4, 5]  # exactly once
        assert len(batches) >= 3  # bounded: never more than 2 versions
        assert all(len(set(vs)) <= 2 for _, vs in batches)
        # RESTART leg: new commits land; a restarted query sharing the
        # checkpoint resumes from the restored offset (the engine's
        # last-batch re-plan seeds the rate-limit cursor) and keeps
        # batches bounded — nothing doubles, nothing is skipped.
        for i in range(6, 9):
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
        more: list[tuple[int, list[int]]] = []

        def sink2(batch, batch_id):
            vs = sorted(
                r["_commit_version"]
                for r in batch.select("_commit_version").collect()
            )
            if vs:
                more.append((batch_id, vs))

        q = (
            lake_cdf_stream(spark, t.path, max_versions_per_batch=2)
            .writeStream.foreachBatch(sink2)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            deadline = _time.time() + 120
            while _time.time() < deadline:
                if sum(len(vs) for _, vs in more) >= 3:
                    break
                _time.sleep(0.5)
        finally:
            q.stop()
        assert sorted(v for _, vs in more for v in vs) == [6, 7, 8]
        assert len(more) >= 2 and all(len(set(vs)) <= 2 for _, vs in more)

    def test_lake_to_stream_to_lake_loop(self, spark, tmp_path):
        """The closed loop: table A's change feed streams into table B
        through foreachBatch + append_stream_batch — exactly-once on
        BOTH sides (source cursor in the checkpoint, sink txn markers
        in B's log), across a restart."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_cdf_stream,
        )

        a = LakeTable.create(
            spark, str(tmp_path / "a"),
            spark.createDataFrame([(1, 5), (2, 6)], "k long, v long"),
        )
        b = LakeTable.create(
            spark, str(tmp_path / "b"),
            spark.createDataFrame([], "k long, v long, _change_type string"),
        )
        ck = str(tmp_path / "ck")

        def sink(batch, batch_id):
            LakeTable.load(batch.sparkSession, str(tmp_path / "b")).append_stream_batch(
                batch.select("k", "v", "_change_type"), "cdf_loop", batch_id
            )

        def drain():
            q = (
                lake_cdf_stream(spark, a.path)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain()
        a.merge(spark.createDataFrame([(2, 60), (3, 7)], "k long, v long"), "k")
        drain()
        drain()  # replay safety: nothing doubles
        got = sorted(
            (r["k"], r["v"], r["_change_type"]) for r in b.read().collect()
        )
        assert got == [
            (1, 5, "insert"), (2, 6, "insert"),
            (2, 6, "update_preimage"), (2, 60, "update_postimage"),
            (3, 7, "insert"),
        ]


# ===================================================================
# Lake as a native streaming SINK (round 9): Spark 4 Python Data
# Source WRITER — executor-staged parquet + one txn-marked lake commit
# per micro-batch; exactly-once across availableNow restarts.
class TestLakeSink:
    def _drain(self, spark, src_dir, schema, path, ck, app="sinkapp"):
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.lake_sink import (
            register_lakesink_datasource,
        )

        register_lakesink_datasource(spark)
        q = (
            spark.readStream.schema(schema).parquet(src_dir)
            .writeStream.format("lakesink")
            .option("path", path)
            .option("app_id", app)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def test_exactly_once_append_with_stats(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], "k long, v long"),
        )
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(i, i * 10) for i in range(1, 51)], "k long, v long"
        ).repartition(4).write.parquet(src)
        ck = str(tmp_path / "ck")
        self._drain(spark, src, "k long, v long", t.path, ck)
        assert t.read().count() == 51
        assert t.last_committed_batch("sinkapp") == 0
        # replay with the same checkpoint: nothing doubles
        self._drain(spark, src, "k long, v long", t.path, ck)
        assert t.read().count() == 51
        # footer stats landed -> point lookup prunes like any append
        assert sorted(r["v"] for r in t.read_where_eq("k", 7).collect()) == [70]
        # new source data with a NEW checkpoint but same app: appended
        spark.createDataFrame([(99, 990)], "k long, v long").write.mode(
            "append"
        ).parquet(src)
        self._drain(spark, src, "k long, v long", t.path, ck)
        assert t.read().count() == 52

    def test_constraint_violation_aborts_batch_whole(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 5)], "k long, v long"),
        )
        t.add_constraint("v_pos", "v > 0")
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(2, 10), (3, -1)], "k long, v long"
        ).write.parquet(src)
        before = t.latest_version()
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.lake_sink import (
            register_lakesink_datasource,
        )

        register_lakesink_datasource(spark)
        q = (
            spark.readStream.schema("k long, v long").parquet(src)
            .writeStream.format("lakesink")
            .option("path", t.path)
            .option("app_id", "bad")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        import pytest as _pytest

        with _pytest.raises(Exception):
            q.awaitTermination(180)
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
        assert t.latest_version() == before  # table untouched
        assert t.read().count() == 1

    def test_feature_gated_tables_refuse_at_start(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.lake_sink import (
            LakeSinkStreamWriter,
        )
        from pyspark.sql.types import StructType

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 5)], "k long, v long"),
            generated_columns={"v2": "v * 2"},
        )
        schema = spark.createDataFrame([(1, 2)], "k long, v long").schema
        with pytest.raises(ValueError, match="generated columns"):
            LakeSinkStreamWriter(t.path, "x", schema)


# ===================================================================
# Lake as a DATA stream (round 9 — Delta non-CDF source parity):
# appends stream as rows; change commits raise unless opted out.
class TestLakeAppendStream:
    def _drain(self, spark, path, out, ck, **kw):
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_append_stream,
        )

        q = (
            lake_append_stream(spark, path, **kw)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return q

    def test_appends_stream_and_change_commit_raises(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        )
        t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck)
        got = spark.read.parquet(out)
        assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]
        assert got.columns == ["k", "v"]  # no meta columns
        # a merge commit poisons the feed: the NEXT drain raises
        t.merge(spark.createDataFrame([(2, 99)], "k long, v long"), "k")
        with pytest.raises(Exception, match="appends-mode|merge"):
            q = self._drain(spark, t.path, out, ck)
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))

    def test_skip_change_commits_and_ignore_deletes(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 10)], "k long, v long"),
        )
        t.delete("k = 1")
        t.append(spark.createDataFrame([(2, 20)], "k long, v long"))
        t.merge(spark.createDataFrame([(2, 99), (4, 40)], "k long, v long"), "k")
        t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck, skip_change_commits=True)
        # only the three append/create inserts arrive
        assert sorted(r["k"] for r in spark.read.parquet(out).collect()) == [
            1, 2, 3,
        ]
        # ignore_deletes tolerates delete commits but still raises on merge
        t2 = LakeTable.create(
            spark, str(tmp_path / "t2"),
            spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
        )
        t2.delete("k = 1")
        t2.append(spark.createDataFrame([(3, 30)], "k long, v long"))
        out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
        self._drain(spark, t2.path, out2, ck2, ignore_deletes=True)
        assert sorted(
            r["k"] for r in spark.read.parquet(out2).collect()
        ) == [1, 2, 3]

    def test_appends_stream_tolerates_metadata_only_commits(
        self, spark, tmp_path
    ):
        """Round 10 (ADVICE r9): property/constraint/schema-metadata
        commits change ZERO rows — the appends stream skips them
        instead of dying with 'downstream state would desync' (Delta's
        non-CDF source does not fail on property-only commits either);
        genuine change commits still raise."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 10)], "k long, v long"),
        )
        t.set_properties({"owner": "me"})          # setprops
        t.add_constraint("k_pos", "k > 0")          # setprops (validated)
        t.set_column_default("v", "5")              # set_column_default
        t.rename_column("v", "val")                 # rename_column
        t.append(spark.createDataFrame([(2, 20)], "k long, val long"))
        t.set_cluster_by(["k"])                     # set_cluster_by
        t.append(spark.createDataFrame([(3, 30)], "k long, val long"))
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        self._drain(spark, t.path, out, ck)
        got = spark.read.parquet(out)
        assert sorted(r["k"] for r in got.collect()) == [1, 2, 3]
        assert sorted(got.columns) == ["k", "val"]  # current names
        # a data-changing commit still raises on the next drain
        t.update("k = 2", {"val": "99"})
        with pytest.raises(Exception, match="appends-mode|update"):
            q = self._drain(spark, t.path, out, ck)
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))


# ===================================================================
# Round 10 — rate-limit cursor hardening (ADVICE r9 high): offsets
# must never regress behind the checkpoint across ANY restart flavor.
class TestRateLimitRestarts:
    def test_rate_limited_clean_committed_restart(self, spark, tmp_path):
        """Full drain with every batch COMMITTED (idle grace before
        stop), then new commits and a restart on the same checkpoint:
        exactly-once delivery, batches stay bounded — pins the engine's
        seed-before-poll call order (partitions(restored, restored)
        precedes the first latestOffset) plus the reader's monotone
        cursor."""
        import time as _time

        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_cdf_stream,
        )

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], "k long, v long"),
        )
        for i in range(1, 6):
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))

        def run(target_versions, ck):
            seen = []

            def sink(batch, bid):
                vs = sorted(
                    r["_commit_version"]
                    for r in batch.select("_commit_version").collect()
                )
                if vs:
                    seen.append(vs)

            q = (
                lake_cdf_stream(spark, t.path, max_versions_per_batch=2)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .start()
            )
            try:
                deadline = _time.time() + 120
                while _time.time() < deadline:
                    if sum(len(v) for v in seen) >= target_versions:
                        break
                    _time.sleep(0.5)
                # idle grace: let the engine COMMIT the final batch so
                # the restart takes the clean-committed path
                _time.sleep(4)
            finally:
                q.stop()
            return seen

        ck = str(tmp_path / "ck")
        first = run(6, ck)
        assert sorted(v for vs in first for v in vs) == [0, 1, 2, 3, 4, 5]
        assert all(len(vs) <= 2 for vs in first)  # bounded
        import os as _os

        committed = sorted(
            int(f) for f in _os.listdir(_os.path.join(ck, "commits"))
            if f.isdigit()
        )
        offsets = sorted(
            int(f) for f in _os.listdir(_os.path.join(ck, "offsets"))
            if f.isdigit()
        )
        # clean shutdown precondition: every planned batch committed
        assert committed and committed[-1] == offsets[-1]
        for i in range(6, 11):
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
        second = run(5, ck)
        got = [v for vs in second for v in vs]
        assert sorted(got) == [6, 7, 8, 9, 10]  # exactly-once, no replay
        assert all(len(vs) <= 2 for vs in second)  # cap survives restart

    def test_rate_limited_availablenow_bounded_progress(self, spark, tmp_path):
        """availableNow falls back to SINGLE-BATCH execution for Python
        data sources, so with max_versions_per_batch each invocation
        advances at most that many commits — bounded PROGRESS per run,
        never loss or duplication; looping drains the feed exactly
        once (the documented contract)."""
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_cdf_stream,
        )

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, 0)], "k long, v long"),
        )
        for i in range(1, 5):
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
        ck = str(tmp_path / "ck")
        runs: list[list[int]] = []
        for _ in range(8):  # 5 commits / 2 per run -> 3 runs needed
            seen: list[int] = []

            def sink(batch, bid, acc=seen):
                acc.extend(
                    r["_commit_version"]
                    for r in batch.select("_commit_version").collect()
                )

            q = (
                lake_cdf_stream(spark, t.path, max_versions_per_batch=2)
                .writeStream.foreachBatch(sink)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            runs.append(sorted(set(seen)))
            if not seen:
                break
        delivered = [v for r in runs for v in r]
        assert sorted(delivered) == [0, 1, 2, 3, 4]  # complete, no dupes
        assert all(len(r) <= 2 for r in runs)  # bounded progress per run
        assert len([r for r in runs if r]) >= 3


# ===================================================================
# Round 10 — lakesink PARTITIONED tables: executor-grouped hive writes
class TestLakeSinkPartitioned:
    def _drain(self, spark, src_dir, schema, path, ck, app="psink"):
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.lake_sink import (
            register_lakesink_datasource,
        )

        register_lakesink_datasource(spark)
        q = (
            spark.readStream.schema(schema).parquet(src_dir)
            .writeStream.format("lakesink")
            .option("path", path)
            .option("app_id", app)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def test_partitioned_sink_prunes_and_matches(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame(
                [(0, "seed", 0)], "k long, region string, v long"
            ).withColumnRenamed("region", "region"),
            partition_by=["region"],
        )
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "us", 10), (2, "eu", 20), (3, "us", 30), (4, None, 40)],
            "k long, region string, v long",
        ).repartition(2).write.parquet(src)
        ck = str(tmp_path / "ck")
        self._drain(spark, src, "k long, region string, v long", t.path, ck)
        got = sorted((r["k"], r["region"], r["v"]) for r in t.read().collect())
        assert got == [
            (0, "seed", 0), (1, "us", 10), (2, "eu", 20),
            (3, "us", 30), (4, None, 40),
        ]
        # entries carry partition metadata -> replace_where prunes them
        parts = {
            json.dumps(a.get("partition"))
            for a in t._snapshot()[1]
            if a.get("partition")
        }
        assert any("us" in p for p in parts) and any("null" in p for p in parts)
        # metadata pruning works on sink-written files
        pruned = t.read_pruned("region", "eu", "eu")
        assert sorted(r["k"] for r in pruned.collect() if r["region"] == "eu") == [2]
        # NULL partition skipping
        assert sorted(
            r["k"] for r in t.read_where_null("region").collect()
        ) == [4]
        # replay: second drain on same checkpoint is a no-op
        self._drain(spark, src, "k long, region string, v long", t.path, ck)
        assert t.read().count() == 5

    def test_partitioned_sink_constraint_on_partition_column(
        self, spark, tmp_path
    ):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, "ok", 0)], "k long, region string, v long"),
            partition_by=["region"],
        )
        t.add_constraint("region_known", "region IN ('ok', 'us', 'eu')")
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "mars", 10)], "k long, region string, v long"
        ).write.parquet(src)
        ck = str(tmp_path / "ck")
        with pytest.raises(Exception, match="region_known|constraint|Stream"):
            q_schema = "k long, region string, v long"
            self._drain(spark, src, q_schema, t.path, ck)
            raise RuntimeError("Stream should have failed")
        assert t.read().count() == 1  # batch aborted whole

    def test_empty_string_partition_value_rejects(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(0, "x", 0)], "k long, region string, v long"),
            partition_by=["region"],
        )
        src = str(tmp_path / "src")
        spark.createDataFrame(
            [(1, "", 10)], "k long, region string, v long"
        ).write.parquet(src)
        ck = str(tmp_path / "ck")
        with pytest.raises(Exception, match="empty-string|Stream"):
            self._drain(spark, src, "k long, region string, v long", t.path, ck)
            raise RuntimeError("Stream should have failed")
        assert t.read().count() == 1

    def test_generated_partition_still_gated(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.lake_sink import (
            LakeSinkStreamWriter,
        )

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, 5)], "k long, v long"),
            generated_columns={"bucket": "pmod(k, 4)"},
            partition_by=["bucket"],
        )
        with pytest.raises(ValueError, match="generated columns"):
            LakeSinkStreamWriter(
                t.path, "x", spark.createDataFrame([(1, 5)], "k long, v long").schema
            )
