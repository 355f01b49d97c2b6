"""BM25 corpus retrieval as DataFrame ops.

Corpus search is a first-class curation tool (mine near-matches of
benchmark prompts, pull topical subsets for data mixing, spot-check
dedup clusters). For a FIXED query, BM25 needs only three corpus
statistics — N, avg doc length, and per-query-term document frequency
— all tiny; scoring is then a narrow per-row expression:

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    idf(t)   = ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5))     (Robertson/Lucene)

Scale shape: ONE stats pass (aggregate + per-term conditional counts,
map-side combined) collects a handful of driver scalars, then ONE scan
scores every document with a literal-folded expression — no joins, no
shuffle in the scoring pass, no UDFs. At 100 TB that is two reads of
the text column, the second inside whole-stage codegen.

tf(t,d) counts whitespace tokens case-insensitively (matching the
engine's tokenizer in ``text_stats.words``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import words


def _tf(tok_col: Column, term: str) -> Column:
    """Occurrences of ``term`` among the doc's lowercased tokens."""
    return F.size(F.filter(tok_col, lambda w: F.lower(w) == term.lower()))


def bm25_stats(df: DataFrame, terms: list[str], text_col: str = "text") -> dict:
    """One aggregation pass → {N, avgdl, df: {term: doc_freq}}."""
    # Token array bound once per row (one projection) — the per-term
    # document-frequency aggregates each reference it, and a same-
    # Project inline expression re-splits per reference.
    tokd = df.select(words(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    # total length as an exact integer sum (a float avg's value depends
    # on partial-sum order; int-total / N is the same double everywhere)
    aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.size(toks).cast("long")).alias("_dl_total"),
    ] + [
        F.sum((_tf(toks, t) > 0).cast("long")).alias(f"_df_{i}")
        for i, t in enumerate(terms)
    ]
    row = tokd.agg(*aggs).collect()[0]
    return {
        "N": int(row["_n"]),
        "avgdl": float(row["_dl_total"]) / float(row["_n"]),
        "df": {t: int(row[f"_df_{i}"]) for i, t in enumerate(terms)},
    }


def bm25_score(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
) -> DataFrame:
    """Adds ``bm25`` (rounded 4dp). Pass precomputed ``stats`` to reuse
    across queries; otherwise one stats pass runs first. The scoring
    expression folds N/avgdl/idf in as LITERALS, so the scan is a pure
    narrow projection."""
    st = stats or bm25_stats(df, terms, text_col)
    df = df.withColumn("_toks", words(F.col(text_col)))  # bound once
    toks = F.col("_toks")
    dl = F.size(toks).cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(st["avgdl"]))
    score: Column = F.lit(0.0)
    for t in terms:
        idf = math.log(1.0 + (st["N"] - st["df"][t] + 0.5) / (st["df"][t] + 0.5))
        tf = _tf(toks, t).cast("double")
        score = score + F.lit(idf) * tf * (k1 + 1.0) / (tf + norm)
    return df.withColumn("bm25", F.round(score, 4)).drop("_toks")


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k matching docs: (id, bm25) by descending score, id-asc
    tiebreak (TakeOrdered — no full sort)."""
    return (
        bm25_score(df, terms, text_col)
        .select(id_col, "bm25")
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
