"""Connected-components dedup clusters + sequence-packing tests:
exact expected values on hand-built graphs/corpora, convergence on
adversarial (path) topologies, greedy-walk invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.clusters import (
    connected_components,
    dedup_clusters,
    keep_cluster_representatives,
)
from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.packing import (
    pack_greedy,
    pack_streaming,
    with_token_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_1 long, id_2 long")


def test_cc_two_triangles_and_bridge(spark):
    # {1,2,3} + {10,11,12} joined by 3-10 bridge → one component min=1;
    # {20,21} separate.
    e = _edges(
        spark,
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)],
    )
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1, 20: 20, 21: 20}


def test_cc_path_graph_converges(spark):
    # 64-node path: diameter 63 — pointer jumping must converge well
    # inside the 25-round rail (≈ log2(64) + 2 edge/jump rounds).
    e = _edges(spark, [(i, i + 1) for i in range(63)])
    got = connected_components(e).collect()
    assert len(got) == 64
    assert {r["component"] for r in got} == {0}


def test_cc_distributed_path_matches_union_find(spark):
    # Force the distributed label-propagation path (threshold 0) and
    # assert it labels identically to the driver union-find fast path
    # on a graph with a bridge, a path, and singleton pairs.
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10), (20, 21)] + [
        (100 + i, 101 + i) for i in range(20)
    ]
    e = _edges(spark, edges)
    fast = {r["node"]: r["component"] for r in connected_components(e).collect()}
    dist = {
        r["node"]: r["component"]
        for r in connected_components(e, small_graph_edges=0).collect()
    }
    assert fast == dist and dist[12] == 1 and dist[120] == 100


def test_cc_transitivity_not_required_of_pairs(spark):
    # A~B, B~C with no A~C edge still forms one cluster.
    e = _edges(spark, [(5, 7), (7, 9)])
    got = {r["node"]: r["component"] for r in connected_components(e).collect()}
    assert got == {5: 5, 7: 5, 9: 5}


def test_dedup_clusters_singletons_and_representatives(spark):
    df = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = _edges(spark, [(1, 4), (4, 5)])
    cl = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(df, pairs).collect()}
    assert cl == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 1}
    kept = sorted(
        r["doc_id"] for r in keep_cluster_representatives(df, pairs).collect()
    )
    assert kept == [0, 1, 2, 3]


def test_pack_streaming_exact_values(spark):
    # budget 10; docs (id, tokens): 4,5,3,9,2 → exclusive cumsums
    # 0,4,9,12,21 → seq_id 0,0,0,1,2; offsets 0,4,9,2,1;
    # spans_cut: 9+3>10 → doc 3 straddles; 2+9>10 → doc 4 straddles.
    df = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 9), (5, 2)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["spans_cut"])
        for r in pack_streaming(df, budget=10).collect()
    }
    assert got == {
        1: (0, 0, False),
        2: (0, 4, False),
        3: (0, 9, True),
        4: (1, 2, True),
        5: (2, 1, False),
    }


def test_pack_greedy_exact_values_and_oversize(spark):
    # budget 10: 4,5 fit bin0 (fill 9); 3 overflows → bin1; 12 is
    # oversized → bin2 alone; 2 opens bin3 (12 filled bin2 past budget).
    df = spark.createDataFrame(
        [(1, 4), (2, 5), (3, 3), (4, 12), (5, 2)], "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill"])
        for r in pack_greedy(df, budget=10).collect()
    }
    assert got == {1: (0, 4), 2: (0, 9), 3: (1, 3), 4: (2, 12), 5: (3, 2)}


def test_pack_greedy_groups_independent(spark):
    df = spark.createDataFrame(
        [(1, "a", 6), (2, "a", 6), (1, "b", 6), (2, "b", 3)],
        "doc_id long, shard string, n_tokens long",
    )
    got = {
        (r["shard"], r["doc_id"]): r["bin_id"]
        for r in pack_greedy(df, budget=10, group_col="shard").collect()
    }
    # Each shard restarts at bin 0; a's second doc overflows, b's fits.
    assert got == {("a", 1): 0, ("a", 2): 1, ("b", 1): 0, ("b", 2): 0}


def test_pack_greedy_never_overfills_except_oversize(spark, sf_dir):
    from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table

    d = with_token_counts(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "n_tokens"
    )
    packed = pack_greedy(d, budget=512, group_col="source")
    per_bin = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n")
    )
    bad = per_bin.filter((F.col("fill") > 512) & (F.col("n") > 1)).count()
    assert bad == 0
    # Every doc packed exactly once.
    assert packed.count() == d.count()


def test_pack_streaming_token_conservation(spark, sf_dir):
    from multi_source_data_lake_with_etl_pipeline_spark.catalog import load_table

    d = with_token_counts(load_table(spark, sf_dir, "documents"))
    packed = pack_streaming(d, budget=1024, group_col="source")
    # Exclusive cumsum reconstruction: per group, sum of tokens equals
    # last doc's seq_id*budget + seq_offset + its tokens.
    last = packed.groupBy("source").agg(
        F.max_by(
            F.col("seq_id") * 1024 + F.col("seq_offset") + F.col("n_tokens"), "doc_id"
        ).alias("reconstructed"),
        F.sum("n_tokens").alias("total"),
    )
    assert last.filter(F.col("reconstructed") != F.col("total")).count() == 0


class TestChunking:
    def test_windows_overlap_and_reconstruct(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.packing import (
            chunk_words,
        )

        text = " ".join(f"w{i}" for i in range(25))
        df = spark.createDataFrame([(1, text)], "doc_id int, text string")
        rows = sorted(
            chunk_words(df, chunk_size=10, overlap=3).collect(),
            key=lambda r: r.chunk_id,
        )
        # 25 words, stride 7: 1 + ceil(15/7) = 4 chunks
        assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
        chunks = [r.chunk_text.split(" ") for r in rows]
        assert all(len(c) <= 10 for c in chunks)
        # consecutive chunks share exactly `overlap` words
        for a, b in zip(chunks, chunks[1:]):
            assert a[-3:] == b[:3]
        # stitching chunks (dropping each successor's overlap) rebuilds the doc
        rebuilt = chunks[0] + [w for c in chunks[1:] for w in c[3:]]
        assert rebuilt == text.split(" ")

    def test_short_and_null_docs(self, spark):
        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.packing import (
            chunk_words,
        )

        df = spark.createDataFrame(
            [(1, "just three words"), (2, None)], "doc_id int, text string"
        )
        rows = chunk_words(df, chunk_size=10, overlap=3).collect()
        assert len(rows) == 1
        assert rows[0].doc_id == 1 and rows[0].chunk_id == 0
        assert rows[0].chunk_text == "just three words"
        assert rows[0].n_chunk_words == 3

    def test_rejects_bad_overlap(self, spark):
        import pytest as _pytest

        from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.packing import (
            chunk_words,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
        with _pytest.raises(ValueError):
            chunk_words(df, chunk_size=10, overlap=10)


def test_cc_distributed_large_path_graphs(spark):
    """Distributed label propagation at real volume: 10 disjoint path
    graphs of 1,000 nodes each (diameter 999 — the worst case for
    label propagation; pointer jumping must converge in ~log2 rounds,
    not 999). Forces the distributed path and checks every component
    label."""
    from pyspark.sql import functions as F

    # edges (i, i+10): the residue classes mod 10 form 10 disjoint
    # 1000-node paths over nodes 0..9999
    e = spark.range(0, 9990).select(
        F.col("id").alias("id_1"), (F.col("id") + 10).alias("id_2")
    )
    out = connected_components(e, small_graph_edges=0)
    agg = (
        out.groupBy("component")
        .count()
        .orderBy("component")
        .collect()
    )
    # components are labeled by their minimum node: 0..9, 1000 each
    assert [(r["component"], r["count"]) for r in agg] == [
        (i, 1000) for i in range(10)
    ]
