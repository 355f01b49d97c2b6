"""Physical-plan assertions: the scale properties SURVEY.md §4 claims
(pushdown, pruning, broadcast, JVM-side expressions, bounded shuffles)
must be visible in `explain`, not just intended.

These tests pin the plan shape so a refactor that silently drops a
pushdown or adds a Python UDF to a hot path fails CI, the same way a
wrong value would.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

import multi_source_data_lake_with_etl_pipeline_spark.queries as q
from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table

from .conftest import SF_SMOKE


def plan_text(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = plan_text(q.pricing_summary(spark, SF_SMOKE))
    # Filter reaches the parquet scan...
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # ...and the scan reads only the 7 needed columns, not all 11.
    read = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_returnflag" in read and "l_comment" not in read
    assert read.count(":") - 1 <= 8  # schema field count ≤ 8
    # Aggregation is JVM codegen, with map-side partial aggregation.
    codegen = plan_text(q.pricing_summary(spark, SF_SMOKE), "codegen")
    assert "WholeStageCodegen subtrees" in codegen
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_regional_revenue_broadcasts_dims(spark):
    plan = plan_text(q.regional_revenue(spark, SF_SMOKE))
    # Small dims (region/nation/customer at smoke SF) must broadcast —
    # no shuffle join on the fact side for this star query.
    assert "BroadcastHashJoin" in plan


def test_events_time_range_pushdown(spark):
    # The silver staging (catalog.silver_path) exists precisely so that
    # time predicates reach the parquet scan as native timestamp
    # filters instead of dying at a long→timestamp conversion.
    plan = plan_text(q.events_time_range(spark, SF_SMOKE))
    assert "GreaterThanOrEqual(ts" in plan and "LessThan(ts" in plan


def test_text_ops_have_no_python_udfs(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import (
        lang_id,
        quality_score,
        text_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    for fn in (text_stats, quality_score, lang_id):
        plan = plan_text(fn(docs))
        assert "EvalPython" not in plan, f"{fn.__name__} fell off the JVM path"


def test_minhash_signatures_shuffle_free(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.dedup import (
        minhash_signatures,
    )

    # Drop caches persisted by earlier dedup runs: a matching cached
    # subtree would splice an InMemoryRelation (with its own AQE plan
    # text) into the explain output and distort the Exchange count.
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_text(minhash_signatures(docs))
    # The signature computation itself is a narrow map: the only
    # allowed Exchange is the explicit small-input widening repartition.
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 1
    assert "EvalPython" not in plan


def test_asof_join_single_shuffle_per_side(spark):
    plan = plan_text(q.asof_purchase_click(spark, SF_SMOKE))
    # As-of join = union + window, not a cross/range join: no
    # CartesianProduct and no BroadcastNestedLoopJoin anywhere.
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_observed_metrics_single_pass(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import observed
    from multi_source_data_lake_with_etl_pipeline_spark.operators.validation import (
        FieldRule,
        validate,
    )

    cust = load_table(spark, SF_SMOKE, "customer")
    flagged = validate(cust, [FieldRule("c_acctbal", required=True, min=0)])
    df, obs = observed(flagged)
    n = df.count()
    got = obs.get
    assert got["n_rows"] == n
    assert 0 < got["n_invalid"] < n  # negative balances exist


def test_schema_compatible(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.operators.normalization import (
        schema_compatible,
    )

    cust = load_table(spark, SF_SMOKE, "customer")
    assert schema_compatible(["c_custkey", "c_name"], cust)
    assert not schema_compatible(["c_custkey", "missing_col"], cust)
    assert schema_compatible(cust, cust)


def test_partitioned_write_prunes_scan(spark, tmp_path):
    # Zone tables written partitionBy(time-derived key) get static
    # partition pruning: a year-filtered read touches 1/Nth of the
    # files (the "automated data partitioning" the reference claims
    # but never implements, README.md:293).
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    orders.write.partitionBy("o_year").mode("overwrite").parquet(path)
    filtered = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    plan = plan_text(filtered)
    pf_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "1996" in pf_line
    years = orders.select("o_year").distinct().count()
    assert filtered.count() == orders.filter(F.col("o_year") == 1996).count()
    assert years > 1  # pruning actually skipped something


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # Co-located join: both sides bucketed on the key → sort-merge join
    # with ZERO Exchange. At 100 TB this is the difference between a
    # full-fact-table shuffle per join and none.
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    (
        orders.write.bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    (
        cust.write.bucketBy(8, "c_custkey")
        .sortBy("c_custkey")
        .option("path", str(tmp_path / "b_customer"))
        .saveAsTable("b_customer")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_text(joined)
        import re

        assert "SortMergeJoin" in plan
        assert not re.findall(r"\(\d+\) Exchange", plan), "bucketed join shuffled"
        assert joined.count() == orders.join(
            cust, orders.o_custkey == cust.c_custkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
        ann_ivf_probe,
        ivf_build,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    centroids = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    path = str(tmp_path / "ivf_idx")
    ivf_build(emb, centroids, path)
    probe = ann_ivf_probe(spark, path, centroids[0][1], centroids, k=5, nprobe=2)
    plan = plan_text(probe)
    pf_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "_centroid" in pf_line and " in (" in pf_line.lower()
    assert probe.count() == 5


def test_supplier_part_star_broadcasts_all_dims(spark):
    plan = plan_text(q.supplier_part_revenue(spark, SF_SMOKE))
    # Three dims (supplier, part, nation) broadcast; the fact side
    # shuffles exactly once — for the final aggregation.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_curation_ops_no_python_udfs_no_shuffle(spark):
    # PII scrub, sampling, and repetition stats are narrow per-row
    # projections/filters: any Exchange or Python-eval node in their
    # plans is a scale regression.
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.pii import scrub
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
        stratified_sample,
    )
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import (
        repetition_stats,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    orders = load_table(spark, SF_SMOKE, "orders")
    for df in (
        scrub(docs),
        repetition_stats(docs),
        stratified_sample(orders, "o_orderkey", "o_orderstatus", {"F": 0.1}),
    ):
        plan = plan_text(df)
        assert "Exchange" not in plan, plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, plan


def test_decontam_broadcasts_benchmark_side(spark):
    # The benchmark gram set must broadcast: the corpus scan may not
    # shuffle for the semi-join (only the matched pairs shuffle for
    # the per-doc count).
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.decontam import (
        contamination,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    out = contamination(
        d.filter(F.col("doc_id") % 97 != 0), d.filter(F.col("doc_id") % 97 == 0), n=4
    )
    plan = plan_text(out)
    assert "BroadcastHashJoin" in plan
    # bounded shuffles: one for the benchmark-side DISTINCT (small
    # side), one for the groupBy(doc_id) count over matched pairs —
    # the full corpus gram stream itself must NOT hash-partition.
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_ivfpq_probe_prunes_partitions_and_reads_codes_only(spark, tmp_path):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
        ann_ivfpq_probe,
        ivfpq_build,
        pq_train,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    rows = emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    centroids = [(int(r["vec_id"]), list(r["embedding"])) for r in rows]
    books = pq_train(emb, m=8, k=8, iters=1)
    path = str(tmp_path / "ivfpq_idx")
    ivfpq_build(emb, centroids, books, path)
    probe = ann_ivfpq_probe(spark, path, centroids[0][1], centroids, books, k=5, nprobe=2)
    plan = plan_text(probe)
    pf_line = next(line for line in plan.splitlines() if "PartitionFilters" in line)
    assert "_centroid" in pf_line and " in (" in pf_line.lower()
    # the scan reads only the compressed representation, never vectors
    rs_line = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "pq_code" in rs_line and "embedding" not in rs_line
    assert probe.count() == 5


def test_hashed_linear_scoring_is_pure_projection(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.scoring import (
        hashed_linear_margin,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    plan = plan_text(hashed_linear_margin(d).select("doc_id", "score_bp"))
    assert "Exchange" not in plan  # zero shuffles: scoring is a narrow map
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Scan parquet" in plan


def test_bm25_scoring_scan_has_no_joins_or_udfs(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.retrieval import (
        bm25_score, bm25_stats,
    )

    d = load_table(spark, SF_SMOKE, "documents")
    st = bm25_stats(d, ["hash", "join"])  # stats pass collected separately
    plan = plan_text(bm25_score(d, ["hash", "join"], stats=st).select("doc_id", "bm25"))
    assert "Join" not in plan  # stats folded in as literals
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_filter_rules_no_shuffle_line_dedup_two_exchanges(spark):
    # Gopher/C4 rule flags are narrow per-row projections — any
    # Exchange or Python-eval node is a scale regression. Line dedup
    # is allowed exactly its two designed shuffles (line-frequency
    # count + per-doc regroup); more means a lost partial aggregate
    # or an accidental distinct.
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.filters import (
        c4_clean,
        dedup_lines_corpus,
        gopher_flags,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    for df in (gopher_flags(docs), c4_clean(docs)):
        plan = plan_text(df)
        assert "Exchange" not in plan, plan
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan, plan
    dd = plan_text(dedup_lines_corpus(docs))
    # hashpartitioning exchanges only; counted on the physical plan:
    # freq groupBy + rebuild groupBy + the left join's two sides may
    # reuse — pin an upper bound of 4 hash exchanges.
    n_ex = dd.count("hashpartitioning")
    assert 0 < n_ex <= 4, dd


def test_widen_noop_on_many_file_input(spark, tmp_path):
    # The 100 TB contract of _widen: a source that already has >=
    # defaultParallelism files is left alone — signatures inherit the
    # scan's split parallelism with ZERO exchanges (at real scale the
    # scan always has thousands of splits, so widening never fires).
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.dedup import (
        minhash_signatures,
    )

    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMOKE, "documents")
    wide_path = str(tmp_path / "docs_many_files")
    n = spark.sparkContext.defaultParallelism
    docs.repartition(n).write.parquet(wide_path)
    many = spark.read.parquet(wide_path)
    plan = plan_text(minhash_signatures(many))
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    # and the narrow job actually runs with the scan's parallelism
    assert minhash_signatures(many).rdd.getNumPartitions() >= n


def test_bpe_pair_counts_single_exchange_no_udfs(spark):
    # Pair mining per merge iteration: zip of two array slices + one
    # hash aggregate over the word table. A second exchange (beyond
    # word_counts' own) or any Python-eval node in the training loop
    # is a scale regression — n_merges iterations multiply it.
    from pyspark.sql import functions as F

    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.bpe import (
        apply_merge,
        pair_counts,
        to_symbols,
        word_counts,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    sym = word_counts(docs).select(
        "word", "freq", to_symbols(F.col("word")).alias("syms")
    )
    plan = plan_text(pair_counts(sym))
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    # word_counts shuffles once on word; pair_counts once on the pair.
    assert 0 < plan.count("hashpartitioning") <= 2, plan
    # merge application adds NO exchange on top of the word table
    merged = plan_text(sym.withColumn("syms", apply_merge(F.col("syms"), "e", "r")))
    assert merged.count("hashpartitioning") <= 1, merged


def test_dup_spans_linear_no_pairwise_blowup(spark):
    # The span profile must stay a linear postings pipeline: no
    # CartesianProduct / nested-loop join (a doc-pair materialization
    # would be quadratic), and a bounded exchange budget — gram-df
    # aggregate, semi-join, per-doc window, final outer join.
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        duplicate_span_profile,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_text(duplicate_span_profile(docs, k=8))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, plan
    assert plan.count("hashpartitioning") <= 6, plan


def test_trim_spans_no_token_explode_on_rebuild(spark):
    # The rebuild side must stay row-granular. The plan's two Generate
    # nodes are both the POSTINGS explode (gram-stats branch + join-back
    # branch of the same derived table); a third would mean the rebuild
    # fell to token granularity, multiplying shuffle volume by average
    # document length — the oracle SQL's shape, deliberately avoided.
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        trim_duplicate_spans,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = plan_text(trim_duplicate_spans(docs, k=8), mode="simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Generate explode") == 2, plan


def test_shingle_explode_no_inferred_filter_tax(spark):
    """The distinct-shingle posting stream must compute the shingle
    expression exactly ONCE. Inner explode lets the optimizer infer a
    pre-Generate filter that inlines the whole HOF (and sink it below
    the widening exchange onto the scan's few splits — measured 10x on
    the jaccard family). explode_outer keeps the plan filter-free
    upstream; the only filter is the cheap post-Generate null check."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.dedup import _distinct_shingles

    d = load_table(spark, SF_SMOKE, "documents")
    sh = _distinct_shingles(d, "text", "doc_id", 3)
    txt = plan_text(sh)
    final = txt.split("== Initial Plan ==")[0]
    # shingle hashing appears once (the Project), never in a Filter
    assert final.count("xxhash64") == 1
    for line in final.splitlines():
        if "Condition" in line:  # the only Filter is on the generated key
            assert "split(" not in line and "xxhash64" not in line


class TestPlanLint:
    """plans/lint.py: the generic screen for 100 TB anti-patterns."""

    def test_cartesian_flagged_broadcast_not(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

        a = spark.range(0, 1000).select(F.col("id").alias("x"))
        b = spark.range(0, 1000).select(F.col("id").alias("y"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            codes = [f.code for f in lint_plan(a.crossJoin(b))]
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        assert "cartesian" in codes
        # broadcast cross join is the sanctioned shape — clean
        assert [f.code for f in lint_plan(a.crossJoin(F.broadcast(b)))] == []

    def test_python_udf_flagged_arrow_not(self, spark):
        from pyspark.sql.functions import pandas_udf, udf

        from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

        a = spark.range(0, 100).select(F.col("id").alias("x"))
        slow = udf(lambda x: x + 1, "long")
        assert [f.code for f in lint_plan(a.select(slow("x")))] == ["python-udf"]

        @pandas_udf("long")
        def fast(s):
            return s + 1

        assert [f.code for f in lint_plan(a.select(fast("x")))] == []

    def test_global_window_flagged_partitioned_not(self, spark):
        from pyspark.sql import Window

        from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

        a = spark.range(0, 100).select(F.col("id").alias("x"), (F.col("id") % 5).alias("g"))
        bad = a.select(F.row_number().over(Window.orderBy("x")).alias("r"))
        assert [f.code for f in lint_plan(bad)] == ["global-window"]
        ok = a.select(F.row_number().over(Window.partitionBy("g").orderBy("x")).alias("r"))
        assert [f.code for f in lint_plan(ok)] == []

    def test_mega_filter_flagged_and_fixed_shape_clean(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.dedup import (
            _distinct_shingles,
            _shingle_set_table,
        )
        from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

        d = load_table(spark, SF_SMOKE, "documents")
        # the pre-round-3 shape: inner explode of the shingle HOF
        bad = _shingle_set_table(d, "text", "doc_id", 3).select(
            "doc_id", F.explode("_sh").alias("_sk")
        )
        assert "mega-filter" in [f.code for f in lint_plan(bad)]
        # the shipped shape is clean
        assert [f.code for f in lint_plan(_distinct_shingles(d, "text", "doc_id", 3))] == []

    def test_registered_flagship_queries_clean(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

        for name in ["pricing_summary", "regional_revenue", "near_dup_pairs_jaccard"]:
            df = q.spark_queries()[name](spark, SF_SMOKE)
            assert [f.code for f in lint_plan(df)] == [], name


def test_weighted_sample_single_window_exchange(spark):
    """A-ES draw = one hash-partition exchange for the per-group
    window; the md5-uniform decode stays a pure projection."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.packing import with_token_counts
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
        weighted_sample_per_group,
    )

    d = with_token_counts(load_table(spark, SF_SMOKE, "documents"))
    out = weighted_sample_per_group(
        d.select("doc_id", "source", "n_tokens"), ["source"], "doc_id", "n_tokens", 5
    )
    txt = plan_text(out).split("== Initial Plan ==")[0]
    import re as _re

    assert len(_re.findall(r"\(\d+\) Exchange", txt)) == 1
    # map-side top-k pushdown: partial WindowGroupLimit BELOW the
    # exchange prunes each partition to k rows before shuffling
    assert "WindowGroupLimit" in txt
    assert "BatchEvalPython" not in txt


def test_ks_drift_single_global_sort(spark):
    """Exact KS needs exactly one global ordering (documented as the
    small-sample audit; PSI is the scale path) — and nothing else."""
    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import ks_drift

    o = load_table(spark, SF_SMOKE, "orders")
    out = ks_drift(
        o.filter("o_orderstatus = 'F'").select("o_totalprice"),
        o.filter("o_orderstatus = 'O'").select("o_totalprice"),
        "o_totalprice",
    )
    txt = plan_text(out).split("== Initial Plan ==")[0]
    assert txt.count("Exchange SinglePartition") <= 2  # window + final agg
    assert "SortMergeJoin" not in txt and "BatchEvalPython" not in txt


def test_winsorized_rollup_no_exact_percentile_buffer(spark):
    """winsorized_price_rollup must compute its p05/p95 bounds from the
    value-histogram + cumulative-count order statistics, never Spark's
    exact `percentile` aggregate, whose buffer holds EVERY group value
    (3 return flags at 100 TB = an unbounded single-buffer sort)."""
    import multi_source_data_lake_with_etl_pipeline_spark.queries as q

    out = q.spark_queries()["winsorized_price_rollup"](spark, SF_SMOKE)
    txt = plan_text(out, "extended")
    assert "percentile(" not in txt  # exact Percentile aggregate banned
    # the scale path: histogram partial-aggregates before any shuffle
    assert "partial_count" in txt or "HashAggregate" in plan_text(out)


def test_knn_label_eval_no_corpus_crossjoin(spark):
    """The batch kNN eval must candidate via the IVF centroid-id
    EQUALITY join — the r3 plan broadcast the query slice into a
    query×corpus cross join (N²/50 cosines, a 100× scale-killer)."""
    import multi_source_data_lake_with_etl_pipeline_spark.queries as q

    out = q.spark_queries()["knn_label_eval"](spark, SF_SMOKE)
    txt = plan_text(out)
    assert "CartesianProduct" not in txt
    # The only nested-loop joins allowed are the assignment legs'
    # ONE-ROW broadcast of the centroid-matrix frame (_cids/_cvecs/
    # _cnorms) — never a query×corpus cross join.
    for chunk in txt.split("BroadcastNestedLoopJoin")[1:]:
        # tree section: build side is the ExistingRDD one-row scan;
        # details section: the following Project carries _cids. A real
        # query×corpus cross join would show parquet scans on BOTH
        # sides and match neither.
        assert "Scan ExistingRDD" in chunk[:1200] or "_cids" in chunk[:1200], txt
    assert "BatchEvalPython" not in txt  # HOF cosine stays JVM-side


def test_all_registered_queries_lint_clean(spark):
    """Every registered query's physical plan passes the 100 TB
    anti-pattern screen (plans/lint.lint_plan), modulo the documented
    exemptions in scripts/lint_sweep.py — queries whose SEMANTICS
    require a flagged shape, each with the reason recorded."""
    import importlib.util
    import os

    from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

    spec = importlib.util.spec_from_file_location(
        "lint_sweep",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "lint_sweep.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Plan-only work (explain, no actions), but each lint pays driver
    # Catalyst analysis serially — a small thread pool overlaps the
    # py4j/JVM waits (guide §2.6) without changing what is asserted.
    from concurrent.futures import ThreadPoolExecutor

    def _lint(item):
        name, fn = item
        try:
            return name, lint_plan(fn(spark, SF_SMOKE))
        except Exception:  # covered by the oracle/rows tests, not here
            return name, []

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(_lint, q.spark_queries().items()))
    bad = []
    for name, findings in results:
        for f in findings:
            if name not in mod.ALLOW.get(f.code, {}):
                bad.append((name, f.code))
    assert bad == []


def test_exact_corr_matrix_single_scan(spark):
    """The correlation matrix is ONE wide aggregation: a single
    parquet scan, one single-partition agg exchange, no sort, no join
    — the sufficient-statistics shape that holds at any corpus size."""
    import multi_source_data_lake_with_etl_pipeline_spark.queries as q

    import re

    out = q.spark_queries()["lineitem_corr_matrix"](spark, SF_SMOKE)
    txt = plan_text(out).split("== Initial Plan ==")[0]
    # formatted explain lists each node once in the tree and once in
    # the details — one physical scan node total
    assert len(re.findall(r"^\(\d+\) Scan parquet", txt, re.M)) == 1, txt
    assert "SortMergeJoin" not in txt and "Sort " not in txt, txt
    assert "BroadcastHashJoin" not in txt, txt

def test_exact_percentile_flagged_approx_not(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.plans.lint import lint_plan

    a = spark.range(0, 100).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("double").alias("v")
    )
    bad = a.groupBy("g").agg(F.percentile("v", F.lit(0.5)).alias("p"))
    assert [f.code for f in lint_plan(bad)] == ["exact-percentile"]
    bad2 = a.groupBy("g").agg(F.median("v").alias("p"))
    assert [f.code for f in lint_plan(bad2)] == ["exact-percentile"]
    ok = a.groupBy("g").agg(F.percentile_approx("v", F.lit(0.5)).alias("p"))
    assert [f.code for f in lint_plan(ok)] == []
    # the sanctioned replacement lints clean too
    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import (
        exact_percentiles,
    )

    assert [
        f.code for f in lint_plan(exact_percentiles(a, ["g"], "v", {"p": 0.5}))
    ] == []


def test_exact_percentiles_plan_shape(spark):
    """Plan contract for the percentile rewrite: NO exact percentile
    aggregate anywhere, the cumulative window carries the group
    partition spec (never a global sort), and the histogram
    aggregation is hash-based with a partial (map-side) phase."""
    import contextlib
    import io

    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import (
        exact_percentiles,
    )

    a = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 41).cast("double").alias("v")
    )
    df = exact_percentiles(a, ["g"], "v", {"p50": 0.5, "p95": 0.95})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "percentile(" not in plan and "median(" not in plan
    assert "windowspecdefinition(g" in plan  # partitioned window
    assert "HashAggregate" in plan and "partial_count" in plan


def test_global_exact_percentiles_window_reads_cached_hist(spark):
    """The bounded_hist guard persists + counts the value histogram;
    that count is only free if the downstream cumulative window READS
    the cache instead of recomputing the aggregation (VERDICT r5 #4).
    Pin InMemoryTableScan below the Window in the executed plan, and
    pin the default finalize path RELEASING the cache on return."""
    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import (
        exact_percentiles,
    )

    a = spark.range(0, 1000).select((F.col("id") % 41).cast("double").alias("v"))
    lazy = exact_percentiles(a, [], "v", {"p50": 0.5}, finalize=False)
    plan = lazy._jdf.queryExecution().executedPlan().toString()
    wi = plan.find("Window")
    assert wi != -1 and "InMemoryTableScan" in plan[wi:], (
        "cumulative window no longer reads the persisted histogram"
    )
    # release the guard cache the lazy path left behind
    spark.catalog.clearCache()
    # default path: result materialized, no relation left cached
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    res = exact_percentiles(a, [], "v", {"p50": 0.5})
    assert res.count() == 1
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # only the localCheckpoint RDD of the 1-row result may remain
    assert after <= before + 1
