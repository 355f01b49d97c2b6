"""Round 10 stretch: PARTITION EVOLUTION (Iceberg parity — Delta
can't): set_partitioning() is a metadata commit affecting future
writes only; old files keep their layout, reads union eras, pruning
applies per-era, row-level ops stay correct over legacy files, and
whole-file partition ops prove non-overlap or refuse with a compact()
remedy."""

from __future__ import annotations

import pytest

from multi_source_data_lake_with_etl_pipeline_spark.lake import LakeTable


def _mk(spark, path, partition_by=None):
    return LakeTable.create(
        spark, str(path),
        spark.createDataFrame(
            [(1, "us", 10), (2, "eu", 20), (3, "us", 30)],
            "k long, region string, v long",
        ),
        partition_by=partition_by,
    )


class TestSetPartitioning:
    def test_unpartitioned_to_partitioned_reads_union_eras(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40), (5, "us", 50)], "k long, region string, v long"
            )
        )
        got = sorted((r["k"], r["region"], r["v"]) for r in t.read().collect())
        assert got == [
            (1, "us", 10), (2, "eu", 20), (3, "us", 30),
            (4, "eu", 40), (5, "us", 50),
        ]
        # new-era files landed hive-partitioned; old files untouched
        parts = {a.get("partition") is not None for a in t._snapshot()[1]}
        assert parts == {True, False}
        assert t.partition_columns() == ["region"]
        # time travel BEFORE the evolution still reads the old layout
        assert t.read(0).count() == 3

    def test_repartition_to_different_column(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t", partition_by=["region"])
        t.set_partitioning(["k"])
        t.append(
            spark.createDataFrame(
                [(9, "apac", 90)], "k long, region string, v long"
            )
        )
        got = sorted((r["k"], r["region"]) for r in t.read().collect())
        assert got == [(1, "us"), (2, "eu"), (3, "us"), (9, "apac")]
        # three layouts never coexist here, but both eras do
        ks = {tuple(sorted((a.get("partition") or {}))) for a in t._snapshot()[1]}
        assert ks == {("region",), ("k",)}

    def test_drop_partitioning(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t", partition_by=["region"])
        t.set_partitioning(None)
        assert t.partition_columns() == []
        t.append(
            spark.createDataFrame(
                [(7, "eu", 70)], "k long, region string, v long"
            )
        )
        assert t.read().count() == 4

    def test_row_level_ops_cover_legacy_files(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")  # unpartitioned era
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40)], "k long, region string, v long"
            )
        )
        # DELETE by partition predicate must reach legacy-era rows too
        res = t.delete("region = 'eu'")
        assert res["deleted"] == 2  # k=2 (legacy) and k=4 (current)
        assert sorted(r["k"] for r in t.read().collect()) == [1, 3]
        # UPDATE likewise
        t.update("region = 'us'", {"v": "v + 1"})
        assert sorted(r["v"] for r in t.read().collect()) == [11, 31]

    def test_replace_where_overlap_guard_and_compact_remedy(
        self, spark, tmp_path
    ):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        new = spark.createDataFrame(
            [(8, "us", 80)], "k long, region string, v long"
        )
        with pytest.raises(ValueError, match="earlier partition layout"):
            t.replace_where(new, "region = 'us'")
        # non-overlapping region works even with legacy files present
        t.replace_where(
            spark.createDataFrame(
                [(6, "apac", 60)], "k long, region string, v long"
            ),
            "region = 'apac'",
        )
        assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 6]
        # compact() migrates every file into the current layout…
        t.compact(target_files=2)
        assert all(
            "region" in (a.get("partition") or {}) for a in t._snapshot()[1]
        )
        # …which unlocks the refused replace_where
        t.replace_where(new, "region = 'us'")
        got = sorted((r["k"], r["region"]) for r in t.read().collect())
        assert got == [(2, "eu"), (6, "apac"), (8, "us")]

    def test_overwrite_partitions_overlap_guard(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        with pytest.raises(ValueError, match="earlier partition layout"):
            t.overwrite_partitions(
                spark.createDataFrame(
                    [(8, "us", 80)], "k long, region string, v long"
                )
            )
        # a partition with no legacy rows overwrites fine
        t.overwrite_partitions(
            spark.createDataFrame(
                [(6, "apac", 60)], "k long, region string, v long"
            )
        )
        assert sorted(r["k"] for r in t.read().collect()) == [1, 2, 3, 6]

    def test_pruning_per_era(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40), (5, "us", 50)], "k long, region string, v long"
            )
        )
        # footer-stat skipping still sees BOTH eras (legacy files carry
        # the column in bytes with real stats; current files carry the
        # injected [v, v] partition stats)
        fs = t.files_overlapping("region", "eu", "eu")
        assert len(fs) >= 2
        got = sorted(r["k"] for r in t.read_pruned("region", "eu", "eu").collect())
        assert got == [2, 4]

    def test_validation_and_guards(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")
        with pytest.raises(ValueError, match="not in schema"):
            t.set_partitioning(["ghost"])
        with pytest.raises(ValueError, match="duplicate"):
            t.set_partitioning(["region", "region"])
        with pytest.raises(ValueError, match="non-partition data column"):
            t.set_partitioning(["k", "region", "v"])
        t.set_partitioning(["region"])
        with pytest.raises(ValueError, match="layout unchanged"):
            t.set_partitioning(["region"])
        # cluster-by exclusivity both ways
        t2 = LakeTable.create(
            spark, str(tmp_path / "t2"),
            spark.createDataFrame([(1, 2)], "a long, b long"),
            cluster_by=["a"],
        )
        with pytest.raises(ValueError, match="liquid"):
            t2.set_partitioning(["a"])
        t2.set_cluster_by(None)
        t2.set_partitioning(["a"])
        assert t2.partition_columns() == ["a"]

    def test_drop_column_guards_legacy_partition_keys(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t", partition_by=["region"])
        t.set_partitioning(["k"])
        # region is no longer the layout, but legacy files key their
        # hive dirs by it — dropping would orphan those values
        with pytest.raises(ValueError, match="earlier partition layout"):
            t.drop_column("region")
        t.compact()
        t.drop_column("region")
        assert "region" not in [f.name for f in t.read().schema.fields]

    def test_changes_and_cdf_across_evolution(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40)], "k long, region string, v long"
            )
        )
        t.delete("k = 2")
        ch = sorted(
            (r["k"], r["_change_type"]) for r in t.changes(-1).collect()
        )
        assert ch == [
            (1, "insert"), (2, "delete"), (2, "insert"),
            (3, "insert"), (4, "insert"),
        ]

    def test_show_partitions_skips_legacy(self, spark, tmp_path):
        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40)], "k long, region string, v long"
            )
        )
        assert t.partitions() == [{"region": "eu"}]

    def test_appends_stream_tolerates_set_partitioning(self, spark, tmp_path):
        from multi_source_data_lake_with_etl_pipeline_spark.streaming.cdf_source import (
            lake_append_stream,
        )

        t = _mk(spark, tmp_path / "t")
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40)], "k long, region string, v long"
            )
        )
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (
            lake_append_stream(spark, t.path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(
            r["k"] for r in spark.read.parquet(out).collect()
        ) == [1, 2, 3, 4]

    def test_dv_delete_across_eras(self, spark, tmp_path):
        """Deletion vectors compose with partition evolution: a dv
        delete touches legacy-era and current-era files alike without
        rewriting either; the anti-join read stays exact."""
        # single multi-row file per era so the dv path vectors in place
        # (a 100%-dead file is dropped outright, Delta parity)
        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame(
                [(1, "us", 10), (2, "eu", 20), (3, "us", 30)],
                "k long, region string, v long",
            ).coalesce(1),
        )
        t.set_partitioning(["region"])
        t.append(
            spark.createDataFrame(
                [(4, "eu", 40), (5, "eu", 45), (6, "us", 50)],
                "k long, region string, v long",
            ).coalesce(1)
        )
        before = {a["path"] for a in t._snapshot()[1]}
        res = t.delete("region = 'eu' AND k IN (2, 4)", dv=True)
        assert res["deleted"] == 2  # k=2 legacy, k=4 current
        after = {a["path"] for a in t._snapshot()[1]}
        assert before == after  # no rewrite: vectored out in place
        assert all(
            a["dv"] is not None
            for a in t._snapshot()[1]
            if a["path"] in {p for p in before}
            and a.get("dv") is not None
        )
        assert sorted(r["k"] for r in t.read().collect()) == [1, 3, 5, 6]
        # CDF recorded the dv delete across both eras
        ch = [r["k"] for r in t.changes(2).filter("_change_type = 'delete'").collect()]
        assert sorted(ch) == [2, 4]
