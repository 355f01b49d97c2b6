"""Round-9 lake hardening (ADVICE r8): string-source generated-
partition derivation is disabled (non-monotone cast), atomic CDC
accepts generated columns, overwrite materializes generated partition
columns before the presence check, empty-string partition values fail
loudly, and k-mismatched bloom index rows are conservatively kept."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.lake import (
    ConstraintViolation,
    LakeTable,
)


class TestStringSourceDerivationDisabled:
    def test_string_cast_date_partition_never_derives(self, spark, tmp_path):
        """A STRING source column under CAST(x AS DATE) must derive NO
        partition bound: string order is not monotone under the cast
        ('2024-1-15' sorts INSIDE ['2024-09-01','2024-10-01'] as a
        string but casts to January), so a derived date bound would
        wrongly skip its partition. The row must come back."""
        df = spark.createDataFrame(
            [(1, "2024-09-05"), (2, "2024-1-15"), (3, "2023-12-31")],
            "k long, s string",
        )
        t = LakeTable.create(
            spark, str(tmp_path / "t"), df,
            partition_by=["d"],
            generated_columns={"d": "CAST(s AS DATE)"},
        )
        # string range that CONTAINS the non-ISO row but whose ISO date
        # prefix range excludes its January partition
        got = sorted(
            r["k"]
            for r in t.read_pruned("s", "2024-09-01", "2024-10-01").collect()
        )
        assert got == [1, 2]
        # point lookup path shares the derivation — same guarantee
        got_eq = [r["k"] for r in t.read_where_eq("s", "2024-1-15").collect()]
        assert got_eq == [2]

    def test_timestamp_source_still_derives(self, spark, tmp_path):
        """The safe path is untouched: a timestamp source still prunes
        the date partitions (only matching dirs listed)."""
        rows = [(i, f"2024-01-{1 + i % 4:02d} 12:00:00") for i in range(40)]
        df = spark.createDataFrame(rows, "k long, s string").select(
            "k", F.col("s").cast("timestamp").alias("ts")
        )
        t = LakeTable.create(
            spark, str(tmp_path / "t"), df,
            partition_by=["event_date"],
            generated_columns={"event_date": "CAST(ts AS DATE)"},
        )
        pr = t.read_pruned("ts", "2024-01-02 00:00:00", "2024-01-02 23:59:59")
        assert sorted(r["k"] for r in pr.collect()) == sorted(
            i for i in range(40) if 1 + i % 4 == 2
        )
        assert pr.inputFiles() and all(
            "event_date=2024-01-02" in f for f in pr.inputFiles()
        )


class TestAtomicCdcGeneratedColumns:
    def _mk(self, spark, path):
        df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
        return LakeTable.create(
            spark, str(path), df, generated_columns={"v2": "v * 2"}
        )

    def test_atomic_accepts_generated_column_in_batch(self, spark, tmp_path):
        """A CDC batch carrying the generated column (correct values)
        applies identically in atomic and non-atomic mode — the 'same
        result, one version' contract."""
        ta = self._mk(spark, tmp_path / "a")
        tb = self._mk(spark, tmp_path / "b")
        batch = spark.createDataFrame(
            [(1, 100, 200, "U"), (3, 30, 60, "I"), (2, None, None, "D")],
            "k long, v long, v2 long, op string",
        )
        ra = ta.apply_cdc(batch, key="k", atomic=True)
        rb = tb.apply_cdc(batch, key="k", atomic=False)
        assert ra["upserted"] == rb["upserted"] == 2
        assert ra["deleted"] == rb["deleted"] == 1
        rows_a = sorted(map(tuple, ta.read().collect()))
        rows_b = sorted(map(tuple, tb.read().collect()))
        assert rows_a == rows_b == [(1, 100, 200), (3, 30, 60)]
        # atomic really was ONE commit (create is version 0)
        assert ra["version"] == 1

    def test_atomic_omitted_generated_column_recomputes(self, spark, tmp_path):
        t = self._mk(spark, tmp_path / "t")
        batch = spark.createDataFrame(
            [(1, 100, "U"), (3, 30, "I")], "k long, v long, op string"
        )
        t.apply_cdc(batch, key="k", atomic=True)
        got = {r["k"]: r["v2"] for r in t.read().collect()}
        assert got == {1: 200, 2: 40, 3: 60}

    def test_atomic_divergent_generated_value_rejected(self, spark, tmp_path):
        """A supplied generated value that disagrees with the expression
        rejects the whole batch BEFORE any commit (non-atomic parity)."""
        t = self._mk(spark, tmp_path / "t")
        v0 = t.latest_version()
        batch = spark.createDataFrame(
            [(1, 100, 999, "U")], "k long, v long, v2 long, op string"
        )
        with pytest.raises(ConstraintViolation, match="GENERATED ALWAYS AS"):
            t.apply_cdc(batch, key="k", atomic=True)
        assert t.latest_version() == v0


class TestOverwriteGeneratedPartition:
    def test_overwrite_supplying_only_source_column(self, spark, tmp_path):
        """overwrite() on a table partitioned by a GENERATED column
        accepts a batch that supplies only the source column — the
        column materializes before the partition-presence check,
        exactly like create/append/replace_where."""
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00")], "k long, s string"
        ).select("k", F.col("s").cast("timestamp").alias("ts"))
        t = LakeTable.create(
            spark, str(tmp_path / "t"), df,
            partition_by=["event_date"],
            generated_columns={"event_date": "CAST(ts AS DATE)"},
        )
        new = spark.createDataFrame(
            [(7, "2024-02-02 08:00:00"), (8, "2024-02-03 09:00:00")],
            "k long, s string",
        ).select("k", F.col("s").cast("timestamp").alias("ts"))
        t.overwrite(new)
        got = {(r["k"], str(r["event_date"])) for r in t.read().collect()}
        assert got == {(7, "2024-02-02"), (8, "2024-02-03")}
        assert t.partition_columns() == ["event_date"]
        # and a genuinely-absent NON-generated partition column still raises
        t2 = LakeTable.create(
            spark, str(tmp_path / "t2"),
            spark.createDataFrame([(1, 2)], "k long, p long"),
            partition_by=["p"],
        )
        with pytest.raises(ValueError, match="missing partition column"):
            t2.overwrite(spark.createDataFrame([(9,)], "k long"))


class TestEmptyStringPartitionValue:
    def test_empty_string_partition_raises(self, spark, tmp_path):
        """'' in a string partition column is indistinguishable from
        NULL in the hive dirname — the write must fail loudly instead
        of silently reading back as NULL."""
        df = spark.createDataFrame([(1, "a"), (2, "")], "k long, p string")
        with pytest.raises(ValueError, match="empty-string"):
            LakeTable.create(spark, str(tmp_path / "t"), df, partition_by=["p"])
        t = LakeTable.create(
            spark, str(tmp_path / "t2"),
            spark.createDataFrame([(1, "a")], "k long, p string"),
            partition_by=["p"],
        )
        v0 = t.latest_version()
        with pytest.raises(ValueError, match="empty-string"):
            t.append(spark.createDataFrame([(3, "")], "k long, p string"))
        assert t.latest_version() == v0

    def test_null_partition_value_still_roundtrips(self, spark, tmp_path):
        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            spark.createDataFrame([(1, "a"), (2, None)], "k long, p string"),
            partition_by=["p"],
        )
        got = {(r["k"], r["p"]) for r in t.read().collect()}
        assert got == {(1, "a"), (2, None)}


class TestBloomKMismatch:
    def test_k_mismatched_index_rows_are_conservative_keep(
        self, spark, tmp_path
    ):
        """An index row recorded with a different k (constant changed
        across builds) can never satisfy the k-gated hit filter — it
        must count as UNINDEXED (file kept), never as 'indexed, no
        hit' (file skipped): results stay exact."""
        df = spark.createDataFrame(
            [(i, f"u{i:04d}") for i in range(100)], "k long, u string"
        )
        t = LakeTable.create(spark, str(tmp_path / "t"), df.repartition(4))
        t.build_value_index("u")
        rel = t.props().get("bloom.u")
        idx_dir = os.path.join(str(tmp_path / "t"), rel)
        idx = spark.read.parquet(idx_dir)
        # simulate an old-build index: bump k on every row
        stale = idx.withColumn("k", F.col("k") + F.lit(1)).collect()
        spark.createDataFrame(
            stale, idx.schema
        ).write.mode("overwrite").parquet(idx_dir + "_stale")
        import shutil

        shutil.rmtree(idx_dir)
        shutil.move(idx_dir + "_stale", idx_dir)
        got = [r["k"] for r in t.read_where_eq("u", "u0042").collect()]
        assert got == [42]
