"""Duplicate-span detection: planted-duplicate exactness, interval
merge semantics, short-doc safety. Oracle row covered by
test_queries_vs_oracle parametrization."""

from __future__ import annotations

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
    duplicate_span_profile,
    duplicated_positions,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_shared_span(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"unique one two three {shared} tail1 tail2"),
        (2, f"{shared} completely different ending here now ok"),
        (3, "nothing in common with the others at all whatsoever"),
    ]
    prof = {
        r["doc_id"]: r
        for r in duplicate_span_profile(_df(spark, rows), k=8).collect()
    }
    # doc1: span starts at token 4, 8 tokens; doc2: starts at 0
    assert prof[1]["n_dup_spans"] == 1 and prof[1]["dup_tokens"] == 8
    assert prof[2]["n_dup_spans"] == 1 and prof[2]["dup_tokens"] == 8
    assert prof[3]["n_dup_spans"] == 0 and prof[3]["dup_tokens"] == 0
    pos = {
        (r["doc_id"], r["pos"])
        for r in duplicated_positions(_df(spark, rows), k=8).collect()
    }
    assert pos == {(1, 4), (2, 0)}


def test_longer_shared_run_merges_into_one_span(spark):
    shared = " ".join(f"w{i}" for i in range(12))  # 12 shared tokens -> 5 windows
    rows = [(1, f"{shared} x y z"), (2, f"p q r {shared}")]
    prof = {
        r["doc_id"]: r
        for r in duplicate_span_profile(_df(spark, rows), k=8).collect()
    }
    assert prof[1]["n_dup_spans"] == 1 and prof[1]["dup_tokens"] == 12
    assert prof[2]["n_dup_spans"] == 1 and prof[2]["dup_tokens"] == 12


def test_two_disjoint_spans(spark):
    a = " ".join(f"a{i}" for i in range(8))
    b = " ".join(f"b{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(10))
    rows = [(1, f"{a} {gap} {b}"), (2, f"{b} other words here {a}")]
    prof = {
        r["doc_id"]: r
        for r in duplicate_span_profile(_df(spark, rows), k=8).collect()
    }
    assert prof[1]["n_dup_spans"] == 2 and prof[1]["dup_tokens"] == 16
    assert prof[2]["n_dup_spans"] == 2 and prof[2]["dup_tokens"] == 16


def test_short_and_empty_docs_safe(spark):
    rows = [(1, "only three words"), (2, ""), (3, "only three words")]
    prof = {
        r["doc_id"]: r
        for r in duplicate_span_profile(_df(spark, rows), k=8).collect()
    }
    assert len(prof) == 3
    assert all(p["n_dup_spans"] == 0 for p in prof.values())
    assert prof[2]["n_tokens"] == 0


def test_within_doc_repeat_not_counted(spark):
    s = " ".join(f"r{i}" for i in range(8))
    rows = [(1, f"{s} middle filler words {s}"), (2, "unrelated text that goes on and on here")]
    prof = {
        r["doc_id"]: r
        for r in duplicate_span_profile(_df(spark, rows), k=8).collect()
    }
    assert prof[1]["n_dup_spans"] == 0  # repeats only within one doc


def test_trim_keeps_first_occurrence(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        trim_duplicate_spans,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"keep me now please {shared}"),
        (2, f"{shared} drop that span above"),
        (3, "an unrelated document with enough words to stand alone"),
    ]
    out = {
        r["doc_id"]: r for r in trim_duplicate_spans(_df(spark, rows), k=8).collect()
    }
    # doc1 is the keeper (min doc id) — untouched
    assert out[1]["text_trimmed"] == rows[0][1] and out[1]["n_removed"] == 0
    # doc2 loses exactly the 8 shared tokens
    assert out[2]["text_trimmed"] == "drop that span above"
    assert out[2]["n_removed"] == 8 and out[2]["n_tokens"] == 12
    assert out[3]["n_removed"] == 0


def test_trim_preserves_original_case(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        trim_duplicate_spans,
    )

    shared = "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta"
    rows = [(1, f"{shared} KEEP Tail"), (2, f"Other Words Stay {shared.lower()}")]
    out = {
        r["doc_id"]: r for r in trim_duplicate_spans(_df(spark, rows), k=8).collect()
    }
    # case-folded matching, original-case rewrite
    assert out[1]["text_trimmed"] == f"{shared} KEEP Tail"
    assert out[2]["text_trimmed"] == "Other Words Stay"


def test_trim_can_empty_a_document(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        trim_duplicate_spans,
    )

    s = " ".join(f"t{i}" for i in range(8))
    rows = [(1, s), (2, s)]
    out = {
        r["doc_id"]: r for r in trim_duplicate_spans(_df(spark, rows), k=8).collect()
    }
    assert out[1]["text_trimmed"] == s  # keeper
    assert out[2]["text_trimmed"] == "" and out[2]["n_removed"] == 8


# --- randomized cross-check vs a brute-force Python reference -------------


def _brute_profile(rows: list[tuple[int, str]], k: int) -> dict[int, tuple[int, int]]:
    """(n_dup_spans, dup_tokens) per doc by literal re-derivation:
    every k-window string, shared across docs, merged as intervals."""
    toks = {d: [t.lower() for t in text.split() if t] for d, text in rows}
    grams: dict[str, set[int]] = {}
    for d, w in toks.items():
        for i in range(len(w) - k + 1):
            grams.setdefault(" ".join(w[i : i + k]), set()).add(d)
    out = {}
    for d, w in toks.items():
        ivs = [
            (i, i + k - 1)
            for i in range(len(w) - k + 1)
            if len(grams[" ".join(w[i : i + k])]) >= 2
        ]
        merged = []
        for s, e in ivs:  # starts ascending; merge overlapping only
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        out[d] = (len(merged), sum(e - s + 1 for s, e in merged))
    return out


def test_random_corpora_match_bruteforce(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> dense collisions
    for trial in range(6):
        k = rng.choice([2, 3, 4])
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 24))))
            for d in range(8)
        ]
        got = {
            r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
            for r in duplicate_span_profile(_df(spark, rows), k=k).collect()
        }
        expected = _brute_profile(rows, k)
        assert got == expected, (trial, k, rows)


def test_incremental_profile_matches_full(spark, tmp_path):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        duplicate_span_profile,
        gram_index_build,
        incremental_span_profile,
    )

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    base_rows = [(1, f"base doc one {shared}"), (2, "base doc two nothing shared here at all")]
    new_rows = [(10, f"{shared} fresh tail words"), (11, "a brand new unique document entirely")]
    base, new = _df(spark, base_rows), _df(spark, new_rows)
    idx = str(tmp_path / "gram_idx")
    gram_index_build(base, idx, k=8)
    inc = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in incremental_span_profile(new, idx, k=8).collect()
    }
    assert inc[10] == (1, 8) and inc[11] == (0, 0)
    full = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in duplicate_span_profile(base.unionByName(new), k=8).collect()
        if r["doc_id"] >= 10
    }
    assert inc == full


def test_incremental_append_grows_index(spark, tmp_path):
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import (
        gram_index_build,
        incremental_span_profile,
    )

    s1 = " ".join(f"x{i}" for i in range(8))
    idx = str(tmp_path / "gram_idx")
    gram_index_build(_df(spark, [(1, s1)]), idx, k=8)
    # batch A shares nothing; appended to index
    a = _df(spark, [(2, " ".join(f"y{i}" for i in range(8)))])
    out = {r["doc_id"]: r["dup_tokens"] for r in incremental_span_profile(a, idx, k=8, append=True).collect()}
    assert out[2] == 0
    # batch B duplicates batch A's text -> found only if the append landed
    b = _df(spark, [(3, " ".join(f"y{i}" for i in range(8)))])
    out = {r["doc_id"]: r["dup_tokens"] for r in incremental_span_profile(b, idx, k=8).collect()}
    assert out[3] == 8
