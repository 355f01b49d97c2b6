"""Unit tests for the training-data curation ops added in round 2:
PII scrub, deterministic sampling, benchmark decontamination,
intra-document repetition stats."""

from __future__ import annotations

import pyspark.sql.functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops import decontam, pii, sampling
from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestPii:
    def test_counts_and_redaction_all_types(self, spark):
        df = _docs(
            spark,
            [(1, "a.b+c@x-mail.co and b@y.org, call 555-123-4567 or 555.987.6543, "
                 "ip 192.168.0.1, ssn 123-45-6789, card 4111 1111 1111 1234")],
        )
        row = pii.scrub(df).first()
        assert row.pii_n_email == 2
        assert row.pii_n_phone == 2
        assert row.pii_n_ipv4 == 1
        assert row.pii_n_ssn == 1
        assert row.pii_n_credit_card == 1
        assert row.pii_n_total == 7
        red = row.text_redacted
        for tok in ("<EMAIL>", "<PHONE>", "<IPV4>", "<SSN>", "<CREDIT_CARD>"):
            assert tok in red
        # no raw digits of the scrubbed identifiers survive
        assert "4567" not in red and "6789" not in red and "1234" not in red

    def test_clean_and_null_text(self, spark):
        df = _docs(spark, [(1, "nothing sensitive here"), (2, None), (3, "")])
        out = {r.doc_id: r for r in pii.scrub(df).collect()}
        assert out[1].pii_n_total == 0
        assert out[1].text_redacted == "nothing sensitive here"
        assert out[2].pii_n_total is None and out[2].text_redacted is None
        assert out[3].pii_n_total == 0

    def test_types_subset_redacts_only_requested(self, spark):
        df = _docs(spark, [(1, "a@b.co and 555-123-4567")])
        row = pii.redact_pii(df, types=["email"]).first()
        assert "<EMAIL>" in row.text_redacted
        assert "555-123-4567" in row.text_redacted

    def test_ssn_phone_card_do_not_cross_match(self, spark):
        # 3-2-4 (ssn), 3-3-4 (phone), 4-4-4-4 (card) group shapes are
        # mutually exclusive — each pattern fires exactly once.
        df = _docs(spark, [(1, "123-45-6789 555-123-4567 4111-1111-1111-1234")])
        row = pii.pii_counts(df).first()
        assert (row.pii_n_ssn, row.pii_n_phone, row.pii_n_credit_card) == (1, 1, 1)


class TestSampling:
    def test_deterministic_across_partitioning(self, spark):
        df = spark.range(0, 5000).withColumnRenamed("id", "k")
        a = sorted(r.k for r in sampling.sample_fraction(df, "k", 0.2).collect())
        b = sorted(
            r.k
            for r in sampling.sample_fraction(df.repartition(17), "k", 0.2).collect()
        )
        assert a == b and 0 < len(a) < 5000

    def test_fraction_bounds(self, spark):
        df = spark.range(0, 500).withColumnRenamed("id", "k")
        assert sampling.sample_fraction(df, "k", 0.0).count() == 0
        assert sampling.sample_fraction(df, "k", 1.0).count() == 500

    def test_salt_changes_membership(self, spark):
        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r.k for r in sampling.sample_fraction(df, "k", 0.3, salt="a").collect()}
        b = {r.k for r in sampling.sample_fraction(df, "k", 0.3, salt="b").collect()}
        assert a != b

    def test_train_holdout_disjoint_and_complete(self, spark):
        df = spark.range(0, 3000).withColumnRenamed("id", "k")
        tr, ho = sampling.split_train_holdout(df, "k", 0.1)
        t = {r.k for r in tr.collect()}
        h = {r.k for r in ho.collect()}
        assert t.isdisjoint(h)
        assert len(t) + len(h) == 3000
        assert 100 < len(h) < 500  # ~10% of 3000

    def test_stratified_matches_direct_predicate(self, spark):
        df = spark.createDataFrame(
            [(i, "AB"[i % 2]) for i in range(2000)], "k long, s string"
        )
        got = {
            (r.k, r.s)
            for r in sampling.stratified_sample(
                df, "k", "s", {"A": 0.5, "B": 0.1}
            ).collect()
        }
        thr_a = sampling.fraction_threshold(0.5)
        thr_b = sampling.fraction_threshold(0.1)
        want = {
            (r.k, r.s)
            for r in df.filter(
                F.substring(F.md5(F.col("k").cast("string")), 1, 4)
                < F.when(F.col("s") == "A", thr_a).otherwise(thr_b)
            ).collect()
        }
        assert got == want and got

    def test_weighted_sample_without_replacement(self, spark):
        """A-ES draw: exact k per group (no repeats), weight>0 only,
        and heavy rows overrepresented vs their population share."""
        rows = [(i, "AB"[i % 2], 100 if i % 10 < 2 else 1) for i in range(2000)]
        rows.append((9999, "A", 0))  # weight 0 never sampled
        df = spark.createDataFrame(rows, "id long, g string, w long")
        got = sampling.weighted_sample_per_group(df, ["g"], "id", "w", k=50).collect()
        by_g = {}
        for r in got:
            by_g.setdefault(r.g, []).append(r)
        assert set(by_g) == {"A", "B"}
        for g, rs in by_g.items():
            assert len(rs) == 50
            assert len({r.id for r in rs}) == 50  # without replacement
            assert sorted(r.sample_rank for r in rs) == list(range(1, 51))
        assert all(r.id != 9999 for r in got)
        # heavy rows are 10% of each group but weigh 100x; true A-ES
        # puts ~96% heavies in a 50-of-1000 draw (simulated 47.9/50)
        heavy = sum(1 for r in got if r.w == 100)
        assert heavy / len(got) > 0.8

    def test_weighted_sample_deterministic(self, spark):
        df = spark.createDataFrame(
            [(i, "x", i % 7 + 1) for i in range(500)], "id long, g string, w long"
        )
        a = {r.id for r in sampling.weighted_sample_per_group(df, ["g"], "id", "w", 20).collect()}
        b = {r.id for r in sampling.weighted_sample_per_group(df.repartition(13), ["g"], "id", "w", 20).collect()}
        assert a == b and len(a) == 20


class TestDecontam:
    def test_planted_contamination_found(self, spark):
        bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
        corpus = _docs(
            spark,
            [
                (1, "totally unrelated words about spark partitions and shuffles"),
                (2, "prefix text then the quick brown fox jumps over something"),
                (3, "short"),
                (4, None),
            ],
        )
        out = {r.doc_id: r.n_overlap for r in decontam.contamination(corpus, bench).collect()}
        # doc 2 shares the 4-grams inside "the quick brown fox jumps over"
        assert out == {2: 3}

    def test_decontaminate_drops_flagged_only(self, spark):
        bench = _docs(spark, [(100, "one two three four five six")])
        corpus = _docs(
            spark,
            [(1, "one two three four different tail"), (2, "clean document with words")],
        )
        kept = sorted(r.doc_id for r in decontam.decontaminate(corpus, bench).collect())
        assert kept == [2]

    def test_min_overlap_threshold(self, spark):
        bench = _docs(spark, [(100, "a b c d e f g h")])
        corpus = _docs(spark, [(1, "a b c d x y z w"), (2, "a b c d e f x y")])
        out = decontam.contamination(corpus, bench, min_overlap=2)
        assert [r.doc_id for r in out.collect()] == [2]


class TestRepetition:
    def test_known_values(self, spark):
        df = _docs(spark, [(1, "a b a b a b"), (2, "w x y z"), (3, "solo"), (4, None)])
        out = {r.doc_id: r for r in repetition_stats(df).collect()}
        # "a b a b a b": 2-grams [ab, ba, ab, ba, ab] -> 5 total, 2 distinct
        assert (out[1].rep_total_ngrams, out[1].rep_distinct_ngrams) == (5, 2)
        assert out[1].rep_ratio_bp == 6000  # (5-2)/5
        assert out[1].rep_top_share_bp == 6000  # "a b" x3 of 5
        assert (out[2].rep_total_ngrams, out[2].rep_ratio_bp) == (3, 0)
        assert out[3].rep_total_ngrams == 0 and out[3].rep_top_share_bp == 0
        assert out[4].rep_total_ngrams == 0

    def test_filterable_quality_rule(self, spark):
        df = _docs(
            spark,
            [(1, "spam spam spam spam spam spam"), (2, "a genuinely varied sentence here")],
        )
        kept = [
            r.doc_id
            for r in repetition_stats(df).filter(F.col("rep_ratio_bp") < 5000).collect()
        ]
        assert kept == [2]


class TestSemantic:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_blocked_pairs_stay_within_block(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
            blocked_neardup_pairs,
        )

        df = self._emb(
            spark,
            [
                (1, 0, [1.0, 0.0]),
                (2, 0, [0.99, 0.05]),   # ~same direction as 1, same block
                (3, 1, [1.0, 0.0]),     # identical to 1 but different block
                (4, 0, [0.0, 1.0]),     # orthogonal
            ],
        )
        pairs = {(r.id_1, r.id_2) for r in
                 blocked_neardup_pairs(df, threshold=0.9).collect()}
        assert pairs == {(1, 2)}

    def test_semantic_dedup_chain_keeps_min_id_per_edge(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
            semantic_dedup,
        )

        # chain: 1~2 and 2~3 but NOT 1~3 — survivor rule drops any row
        # with a smaller-id neighbor, so 2 and 3 both drop (3 via 2).
        df = self._emb(
            spark,
            [
                (1, 0, [1.0, 0.0]),
                (2, 0, [0.96, 0.28]),   # cos(1,2) ≈ 0.96
                (3, 0, [0.83, 0.55]),   # cos(2,3) ≈ 0.95, cos(1,3) ≈ 0.83
                (4, 0, [0.0, 1.0]),     # unrelated survivor
            ],
        )
        kept = sorted(
            r.vec_id for r in semantic_dedup(df, threshold=0.9).collect()
        )
        assert kept == [1, 4]

    def test_kmeans_deterministic_and_improving(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
            _lit_vec,
            cosine,
            kmeans,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

        def mean_own_cos(iters):
            cents, assigned = kmeans(emb, k=4, iters=iters)
            sims = F.array(*[cosine(F.col("embedding"), _lit_vec(c)) for _, c in cents])
            ids = F.array(*[F.lit(cid) for cid, _ in cents])
            own = F.element_at(sims, F.array_position(ids, F.col("_centroid")).cast("int"))
            return assigned.agg(F.avg(own)).first()[0], {
                r.vec_id: r._centroid for r in assigned.select("vec_id", "_centroid").collect()
            }

        cos1, asg_a = mean_own_cos(1)
        cos3, _ = mean_own_cos(3)
        _, asg_b = mean_own_cos(1)
        assert asg_a == asg_b  # deterministic rerun
        assert cos3 >= cos1 - 1e-9  # Lloyd's never degrades the objective

    def test_kmeans_partitions_all_rows(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
            kmeans,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cents, assigned = kmeans(emb, k=4, iters=2)
        assert len(cents) == 4
        per = assigned.groupBy("_centroid").count().collect()
        assert sum(r["count"] for r in per) == emb.count()


class TestMixToBudget:
    def test_weighted_shares_and_determinism(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
            mix_to_budget,
        )
        from pyspark.sql import functions as F

        rows = [(i, "heavy" if i < 4000 else "light") for i in range(8000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = mix_to_budget(df, "source", "doc_id", {"heavy": 3, "light": 1}, 1000)
        counts = {r.source: r.n for r in out.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        # ~750 heavy / ~250 light (hash sampling: binomial jitter)
        assert 650 < counts["heavy"] < 850
        assert 180 < counts["light"] < 320
        # deterministic: identical set on re-run and under repartitioning
        again = mix_to_budget(
            df.repartition(17), "source", "doc_id", {"heavy": 3, "light": 1}, 1000
        )
        assert {r.doc_id for r in out.collect()} == {r.doc_id for r in again.collect()}

    def test_availability_cap_keeps_all(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
            mix_to_budget,
        )

        df = spark.createDataFrame(
            [(i, "rare" if i < 10 else "bulk") for i in range(1000)],
            "doc_id long, source string",
        )
        # rare's target (half the budget) exceeds its 10 rows → keep all
        out = mix_to_budget(df, "source", "doc_id", {"rare": 1, "bulk": 1}, 400)
        kept_rare = out.filter("source = 'rare'").count()
        assert kept_rare == 10


class TestVocabOOV:
    def test_oov_counts_exact(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.vocab import (
            build_vocab,
            oov_stats,
        )

        # 'common' appears in 3 docs (>= min_df 2); rare tokens don't.
        rows = [
            (1, "common alpha common"),
            (2, "common beta"),
            (3, "common GAMMA gamma"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        vocab = {r["token"] for r in build_vocab(df, min_df=2).collect()}
        # case-folded GAMMA/gamma collapse to one token in ONE doc (df=1),
        # so only 'common' (df=3) clears min_df=2
        assert vocab == {"common"}
        out = {r["doc_id"]: r.asDict() for r in oov_stats(df, min_df=2).collect()}
        assert out[1] == {"doc_id": 1, "n_tokens": 3, "n_oov": 1, "oov_bp": 3333}
        assert out[2] == {"doc_id": 2, "n_tokens": 2, "n_oov": 1, "oov_bp": 5000}
        assert out[3] == {"doc_id": 3, "n_tokens": 3, "n_oov": 2, "oov_bp": 6666}
        assert out[4] == {"doc_id": 4, "n_tokens": 0, "n_oov": 0, "oov_bp": 0}
