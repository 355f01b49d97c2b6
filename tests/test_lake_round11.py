"""Round 11 (optimization): commit-log snapshot/props/commit caches.

The caches memoize PARSED immutable commit-log state keyed by
(log_dir, version) and validated by the version file's stat signature
(inode, size, mtime_ns). These tests pin the invalidation contract:
a recreated table at the same path, a commit from ANOTHER handle to
the same table, and a props-changing commit must all be visible
immediately — the cache may only ever skip re-parsing bytes that are
provably identical.
"""

from __future__ import annotations

import shutil

from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable


class TestLogCaches:
    def test_snapshot_sees_other_handles_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        t1 = LakeTable.create(
            spark, path, spark.createDataFrame([(1, 10)], "k long, v long")
        )
        assert t1.read().count() == 1  # replay cached at v0
        t2 = LakeTable(spark, path)  # independent handle, same log
        t2.append(spark.createDataFrame([(2, 20)], "k long, v long"))
        # t1 must see v1 (latest discovery is uncached listdir; the
        # cached v0 state may only serve as the extension base)
        assert t1.read().count() == 2
        assert sorted(r["k"] for r in t1.read().collect()) == [1, 2]

    def test_recreated_table_never_serves_stale_snapshot(self, spark, tmp_path):
        path = str(tmp_path / "t")
        t = LakeTable.create(
            spark, path, spark.createDataFrame([(1, 10)], "k long, v long")
        )
        t.append(spark.createDataFrame([(2, 20)], "k long, v long"))
        assert t.read().count() == 2  # populate replay cache at v0+v1
        shutil.rmtree(path)
        t2 = LakeTable.create(
            spark, path, spark.createDataFrame([(9, 90)], "k long, v long")
        )
        got = t2.read().collect()
        assert [(r["k"], r["v"]) for r in got] == [(9, 90)]
        # time travel on the recreated table reads the NEW v0
        got0 = t2.read(0).collect()
        assert [(r["k"], r["v"]) for r in got0] == [(9, 90)]

    def test_props_cache_invalidates_on_new_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        t = LakeTable.create(
            spark, path, spark.createDataFrame([(1, 10)], "k long, v long")
        )
        assert "team" not in t.props()  # cached at v0
        t.set_properties({"team": "etl"})
        assert t.props()["team"] == "etl"  # new version, new key
        # versioned props still serve the old dict at the old version
        assert "team" not in t.props(0)
        # a SECOND handle sees the same (shared module-level cache)
        assert LakeTable(spark, path).props()["team"] == "etl"

    def test_time_travel_after_many_commits(self, spark, tmp_path):
        path = str(tmp_path / "t")
        t = LakeTable.create(
            spark, path, spark.createDataFrame([(0, 0)], "k long, v long")
        )
        for i in range(1, 13):  # crosses the checkpoint cadence (10)
            t.append(spark.createDataFrame([(i, i * 10)], "k long, v long"))
        # interleave cached reads at several versions, then verify all
        assert t.read(3).count() == 4
        assert t.read(11).count() == 12
        assert t.read(3).count() == 4  # exact cache hit, same answer
        for v in (0, 5, 10, 12):
            assert t.read(v).count() == v + 1
