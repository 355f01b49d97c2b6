"""C4/Gopher heuristic filter rules + cross-corpus line dedup, on a
synthetic multi-line corpus (the lake's documents table is flat text,
so line-level behavior is pinned here with exact expected values)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.filters import (
    c4_clean,
    dedup_lines_corpus,
    gopher_flags,
)

GOOD_LINE = "The quick brown fox jumps over the lazy dog today."  # 10 words, terminal '.'


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # 0: clean multi-line page — enough kept lines for C4
        (0, "\n".join([GOOD_LINE] * 3 + ["short line", ""])),
        # 1: bullet-heavy
        (1, "\n".join(["- item one here now", "- item two here now", "* item three", GOOD_LINE])),
        # 2: ellipsis-heavy
        (2, "\n".join(["to be continued...", "read more…", GOOD_LINE])),
        # 3: lorem ipsum page
        (3, GOOD_LINE + "\nLorem ipsum dolor sit amet.\n" + GOOD_LINE + "\n" + GOOD_LINE),
        # 4: curly brace page (code)
        (4, "\n".join([GOOD_LINE, "function f() { return 1; }", GOOD_LINE, GOOD_LINE])),
        # 5: javascript-mention line
        (5, "\n".join([GOOD_LINE, "Please enable JavaScript to view this page.", GOOD_LINE, GOOD_LINE])),
        # 6: symbol noise
        (6, "# # # # # " + GOOD_LINE),
        # 7: empty
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _flags(df, doc_id):
    return df.filter(F.col("doc_id") == doc_id).collect()[0].asDict()


class TestGopher:
    def test_bullet_rule(self, corpus):
        out = gopher_flags(corpus)
        # doc 1: 3 of 4 lines start with a bullet = 75% ≤ 90% → OK
        assert _flags(out, 1)["gopher_bullet_ok"] is True
        only_bullets = corpus.sparkSession.createDataFrame(
            [(9, "- a b c\n- d e f")], "doc_id int, text string"
        )
        assert _flags(gopher_flags(only_bullets), 9)["gopher_bullet_ok"] is False

    def test_ellipsis_rule(self, corpus):
        # doc 2: 2 of 3 lines end with ellipsis = 66% > 30% → fail
        assert _flags(gopher_flags(corpus), 2)["gopher_ellipsis_ok"] is False
        assert _flags(gopher_flags(corpus), 0)["gopher_ellipsis_ok"] is True

    def test_symbol_rule(self, corpus):
        # doc 6: 5 '#' over 15 words = 33% ≥ 10% → fail
        assert _flags(gopher_flags(corpus), 6)["gopher_symbol_ratio_ok"] is False
        assert _flags(gopher_flags(corpus), 0)["gopher_symbol_ratio_ok"] is True

    def test_word_count_and_empty(self, corpus):
        out = gopher_flags(corpus)
        f7 = _flags(out, 7)
        assert f7["gopher_word_count_ok"] is False
        assert f7["gopher_mean_word_len_ok"] is False  # 0-word guard
        assert f7["gopher_keep"] is False
        # doc 0: 32 words < 50 → word count fails but other rules hold
        f0 = _flags(out, 0)
        assert f0["gopher_word_count_ok"] is False
        assert f0["gopher_alpha_word_ok"] is True
        # only 'the' from the stopword list appears → 1 distinct < 2
        assert f0["gopher_stopword_ok"] is False
        two_stops = gopher_flags(
            out.sparkSession.createDataFrame(
                [(8, "the cat went to the store")], "doc_id int, text string"
            )
        )
        assert _flags(two_stops, 8)["gopher_stopword_ok"] is True

    def test_mean_word_len_band(self, spark):
        long_words = spark.createDataFrame(
            [(1, "supercalifragilistic extraordinarily incomprehensibilities")],
            "doc_id int, text string",
        )
        assert _flags(gopher_flags(long_words), 1)["gopher_mean_word_len_ok"] is False


class TestC4:
    def test_line_keep_rules(self, corpus):
        out = c4_clean(corpus)
        f0 = _flags(out, 0)
        # 3 good lines kept; "short line" (no terminal punct, <5 words) dropped
        assert f0["c4_n_kept"] == 3 and f0["c4_n_lines"] == 4
        assert f0["c4_keep"] is True
        assert f0["c4_text"] == "\n".join([GOOD_LINE] * 3)

    def test_page_rules(self, corpus):
        out = c4_clean(corpus)
        assert _flags(out, 3)["c4_keep"] is False  # lorem ipsum
        assert _flags(out, 4)["c4_keep"] is False  # '{'
        f5 = _flags(out, 5)
        assert f5["c4_n_kept"] == 3  # javascript line dropped
        assert f5["c4_keep"] is True

    def test_empty_doc(self, corpus):
        f7 = _flags(c4_clean(corpus), 7)
        assert f7["c4_n_lines"] == 0 and f7["c4_n_kept"] == 0
        assert f7["c4_text"] == "" and f7["c4_keep"] is False


class TestLineDedup:
    def test_cross_doc_boilerplate_removed(self, spark):
        rows = [
            (1, "unique alpha line\nCOMMON FOOTER\nunique beta line"),
            (2, "another doc body\nCOMMON FOOTER"),
            (3, "COMMON FOOTER"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        out = {r["doc_id"]: r.asDict() for r in dedup_lines_corpus(df).collect()}
        assert out[1]["text"] == "unique alpha line\nunique beta line"
        assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
        assert out[2]["text"] == "another doc body"
        # all-boilerplate doc survives with empty text (caller's policy)
        assert out[3]["text"] == "" and out[3]["n_kept"] == 0

    def test_within_doc_repeat_kept(self, spark):
        df = spark.createDataFrame(
            [(1, "same line\nsame line\nother")], "doc_id int, text string"
        )
        out = dedup_lines_corpus(df).collect()[0]
        # duplicated within ONE doc: doc-frequency is 1 → kept, order stable
        assert out["text"] == "same line\nsame line\nother"

    def test_max_doc_freq_threshold(self, spark):
        rows = [(i, "shared line\nbody %d" % i) for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        relaxed = dedup_lines_corpus(df, max_doc_freq=3).collect()
        assert all(r["n_kept"] == 2 for r in relaxed)
        strict = dedup_lines_corpus(df, max_doc_freq=2).collect()
        assert all(r["n_kept"] == 1 for r in strict)


# --- property-style randomized invariants (single batch per property,
# mirroring tests/test_properties.py conventions) ---------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

doc_texts = st.text(
    alphabet="abcdefg THE the to of and #.…!?\n -*•'\"{}",
    min_size=0,
    max_size=200,
)


@settings(max_examples=20, deadline=None)
@given(st.lists(doc_texts, min_size=1, max_size=40))
def test_gopher_flags_total_and_consistent(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    rows = gopher_flags(df).collect()
    flag_cols = [c for c in rows[0].asDict() if c.startswith("gopher_") and c != "gopher_keep"]
    for r in rows:
        d = r.asDict()
        assert all(isinstance(d[c], bool) for c in flag_cols + ["gopher_keep"]), d
        assert d["gopher_keep"] == all(d[c] for c in flag_cols), d


@settings(max_examples=20, deadline=None)
@given(st.lists(doc_texts, min_size=1, max_size=40))
def test_c4_kept_lines_obey_rules(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    for r in c4_clean(df).collect():
        d = r.asDict()
        assert 0 <= d["c4_n_kept"] <= d["c4_n_lines"]
        kept = d["c4_text"].split("\n") if d["c4_text"] else []
        assert len(kept) == d["c4_n_kept"]
        for line in kept:
            assert re.search(r"""[.!?"']$""", line), line
            assert len(line.split()) >= 5, line
            assert "javascript" not in line.lower()


@settings(max_examples=15, deadline=None)
@given(st.lists(doc_texts, min_size=1, max_size=30))
def test_line_dedup_conservation(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    rows = dedup_lines_corpus(df).collect()
    assert len(rows) == len(texts)  # every doc survives (maybe empty)
    for r in rows:
        d = r.asDict()
        assert 0 <= d["n_kept"] <= d["n_lines"]
        kept = d["text"].split("\n") if d["text"] else []
        assert len(kept) == d["n_kept"]
        orig = [l.strip() for l in texts[d["doc_id"]].split("\n") if l.strip()]
        # kept lines are a subsequence of the original trimmed lines
        it = iter(orig)
        assert all(any(o == k for o in it) for k in kept), (orig, kept)
