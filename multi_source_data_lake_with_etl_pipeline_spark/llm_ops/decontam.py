"""Benchmark decontamination: flag training documents that share
word n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (WebText/GPT-2 13-gram filter,
The Pile / Llama n-gram overlap checks): any training doc containing a
long-enough n-gram that also appears in a benchmark document is
suspect and gets dropped or audited.

Shape at 100 TB: the benchmark side is small (eval sets are MBs) —
its distinct gram set broadcasts, so the corpus side is ONE narrow
scan + hash-semi-join with no shuffle of the corpus at all. Grams are
compared by an 8-byte hash prefix (md5 for cross-engine parity, like
llm_ops/dedup.py), not the raw string, so the broadcast table and the
probe keys stay tiny. Per-doc overlap counting needs the corpus
grouped by doc_id once — a single shuffle of (doc_id, matched-gram)
pairs, which is at most corpus-gram volume but in practice only the
contaminated sliver.

Reference parity: no equivalent in the reference (its dedup is exact
row-hash only, src/transformers/data_enricher.py:60-78); this is part
of the training-data superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import widen
from .text_stats import shingles


def ngram_hash_set(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 4
) -> DataFrame:
    """(id, gram_hash) — DISTINCT word-n-gram 16-hex-char hashes per doc.

    Distinct-per-doc before any join so a gram repeated inside one doc
    counts once (overlap counts are set semantics, like the published
    filters). The input is widened first: gram hashing is shuffle-free
    and would otherwise inherit a small scan's 1-2 splits and pin the
    whole corpus to 1-2 cores (no-op when the scan already has
    cluster-wide splits)."""
    from .text_stats import shingles_of_words, words

    # Token array bound behind its own projection: the shingle
    # transform references it per element_at, and Catalyst re-inlines
    # a single-Project expression once per reference (see
    # dedup._shingle_set_table — measured multi-x win).
    w = widen(df.select(id_col, text_col)).select(
        F.col(id_col), words(F.col(text_col)).alias("_w")
    )
    grams = F.array_distinct(shingles_of_words(F.col("_w"), n))
    # explode_outer + null filter: inner explode's inferred pre-Generate
    # filter would inline the whole shingle expression (2x cost; see
    # dedup._distinct_shingles).
    return (
        w.select(F.col(id_col), F.explode_outer(grams).alias("gram"))
        .filter(F.col("gram").isNotNull())
        .select(id_col, F.substring(F.md5(F.col("gram")), 1, 16).alias("gram_hash"))
    )


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per contaminated corpus doc: how many distinct n-grams it shares
    with the benchmark set.

    Returns (id_col, n_overlap) for docs with n_overlap >= min_overlap.
    Docs with zero overlap are absent (the clean 99.9% — emitting them
    would turn a sliver into a full-corpus result).
    """
    bench_grams = ngram_hash_set(benchmark, id_col, text_col, n).select("gram_hash").distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    corpus_grams = ngram_hash_set(corpus, id_col, text_col, n)
    hits = corpus_grams.join(bench_grams, "gram_hash")  # inner: keep matches only
    out = hits.groupBy(id_col).agg(F.count("*").cast("long").alias("n_overlap"))
    if min_overlap > 1:
        out = out.filter(F.col("n_overlap") >= min_overlap)
    return out


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti join on the flagged
    id set — the flagged side is tiny, so it broadcasts)."""
    bad = contamination(corpus, benchmark, id_col, text_col, n, min_overlap).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
