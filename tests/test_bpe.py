"""BPE tokenizer training: exactness vs a from-scratch pure-Python
reference (independent tokenization path), fold edge cases, encode
accounting. The registered queries' oracle rows are covered by
test_queries_vs_oracle parametrization."""

from __future__ import annotations

import collections
import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.bpe import (
    END,
    apply_merge,
    bpe_train,
    encode_corpus,
    encode_word,
    to_symbols,
    word_counts,
)

SF = "/root/testdata/sf0.001"


def _python_bpe_reference(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """From-scratch word-frequency BPE (Sennrich): independent of every
    Spark code path, including tokenization."""
    freq: collections.Counter[str] = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                freq[w] += 1
    syms = {w: list(w) + [END] for w in freq}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pc: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += freq[w]
        if not pc:
            break
        # max count, ties broken lexicographically — mirror of bpe_train
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark):
    texts = [r["text"] for r in spark.read.parquet(f"{SF}/documents.parquet").collect()]
    expected = _python_bpe_reference(texts, 12)
    merges, table = bpe_train(
        spark.read.parquet(f"{SF}/documents.parquet"), n_merges=12
    )
    got = [(l, r) for _, l, r, _ in merges]
    table.unpersist()
    assert got == expected


def test_apply_merge_greedy_non_overlapping(spark):
    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("ab",), ("ba",), ("",)], "word string"
    ).select("word", to_symbols(F.col("word")).alias("syms"))
    out = {
        r["word"]: list(r["syms"])
        for r in df.select(
            "word", apply_merge(F.col("syms"), "a", "a").alias("syms")
        ).collect()
    }
    assert out["aaa"] == ["aa", "a", END]
    assert out["aaaa"] == ["aa", "aa", END]
    assert out["ab"] == ["a", "b", END]
    assert out["ba"] == ["b", "a", END]
    assert out[""] == [END]  # marker-only survives untouched
    # python mirror agrees on every case
    for w, s in out.items():
        assert encode_word(w, [("a", "a")]) == s


def test_apply_merge_marker_pair(spark):
    df = spark.createDataFrame([("ab",), ("b",)], "word string").select(
        "word", to_symbols(F.col("word")).alias("syms")
    )
    out = {
        r["word"]: list(r["syms"])
        for r in df.select(
            "word", apply_merge(F.col("syms"), "b", END).alias("syms")
        ).collect()
    }
    assert out["ab"] == ["a", "b" + END]
    assert out["b"] == ["b" + END]


def test_encode_corpus_token_accounting(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    merges, table = bpe_train(d, n_merges=8)
    table.unpersist()
    ms = [(l, r) for _, l, r, _ in merges]
    enc = encode_corpus(d, ms)
    row = enc.agg(
        F.sum("n_bpe_tokens").alias("n"),
        F.sum(F.size("bpe_tokens")).alias("sz"),
    ).collect()[0]
    assert row["n"] == row["sz"] and row["n"] > 0
    # every doc's token count >= its word count (merges never cross words,
    # each word contributes >= 1 symbol... actually >= 2 incl. marker)
    wc = word_counts(d).agg(F.sum("freq").alias("w")).collect()[0]["w"]
    assert row["n"] >= 2 * wc


def test_encode_word_empty_merges():
    assert encode_word("hi", []) == ["h", "i", END]
