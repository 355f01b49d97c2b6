"""Distributed BPE tokenizer training (merge-pair learning) + encoding.

Part of the LLM-training-data superset (SURVEY §2 LLM ops — the
reference has no tokenizer; a training-data engine needs one for token
accounting, packing budgets, and vocabulary-aware curation). Algorithm
is the public word-frequency BPE formulation (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"):
learn merges on the DISTINCT-WORD table weighted by word frequency,
never on the raw corpus.

Shape at 100 TB:
- ``word_counts``: the only corpus-wide pass — one map-side-combined
  shuffle reducing ~10^13 tokens to the distinct-word table (~10^7-10^8
  types at web scale; Zipf makes the reduction enormous). Everything
  after runs on that table.
- per merge iteration: adjacent-pair counts are a zip of two array
  slices (no explode of characters per document — the corpus is never
  touched again), one shuffle over (pair, freq), and a driver fetch of
  exactly ONE row (the argmax). Merge application is a per-row HOF
  fold — narrow, no shuffle.
- lineage: each iteration localCheckpoints the symbol table (same
  discipline as ``clusters.py``) so n_merges iterations don't stack
  n_merges plans; on a real cluster checkpoint to durable storage.
- encoding the corpus with learned merges is embarrassingly parallel:
  Arrow-batched ``mapInPandas`` with the merge list broadcast by
  closure — the canonical vectorized-UDF workload (a tokenizer is real
  Python work, not an expressible Column).

Greedy semantics, shared by the Column fold and the Python encoder
(they must mirror each other exactly — ``bpe_encode_parity`` asserts
it): scan left-to-right; merge current symbol into the accumulator's
last element iff (last, current) equals the pair; a freshly merged
token never re-merges with the next symbol under the same pair
(classic non-overlapping BPE application).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import words

END = "</w>"  # end-of-word marker, its own final symbol (Sennrich convention)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): lowercased whitespace tokens. The one corpus-wide
    shuffle; partial aggregation collapses each partition's Zipf head
    before the exchange."""
    # explode_outer + null filter, not inner explode: the optimizer
    # would infer a pre-Generate filter that inlines the whole
    # split/transform (2x the tokenize cost; see dedup._distinct_shingles).
    return (
        df.select(
            F.explode_outer(
                F.transform(words(F.col(text_col)), lambda w: F.lower(w))
            ).alias("word")
        )
        .filter(F.col("word").isNotNull())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def to_symbols(word: Column) -> Column:
    """Initial symbol sequence: characters + the end-of-word marker."""
    chars = F.filter(F.split(word, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(END)))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<l,r>> of adjacent symbol pairs (empty for size<2)."""
    n = F.size(syms)
    left = F.slice(syms, 1, F.greatest(n - 1, F.lit(0)))
    right = F.slice(syms, 2, F.greatest(n - 1, F.lit(0)))
    return F.zip_with(left, right, lambda a, b: F.struct(a.alias("l"), b.alias("r")))


def pair_counts(sym_df: DataFrame, syms_col: str = "syms", freq_col: str = "freq") -> DataFrame:
    """Frequency-weighted adjacent-pair counts over the symbol table.
    One shuffle on (left_sym, right_sym)."""
    pairs = sym_df.select(
        F.explode_outer(_adjacent_pairs(F.col(syms_col))).alias("p"), F.col(freq_col)
    ).filter(F.col("p").isNotNull())
    return (
        pairs.groupBy(
            F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
        )
        .agg(F.sum(freq_col).alias("pair_count"))
    )


def apply_merge(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left+right, greedy
    left-to-right non-overlapping. Pure HOF fold — no shuffle, no UDF.
    ``try_element_at`` keeps the empty-accumulator probe NULL-safe
    under ANSI mode (no eager element_at on an empty array)."""
    merged = F.lit(left + right)
    fold = F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left)) & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    has_pair = F.exists(
        _adjacent_pairs(syms),
        lambda p: (p["l"] == F.lit(left)) & (p["r"] == F.lit(right)),
    )
    # Skip the fold on rows without the pair — at scale most words are
    # untouched by any given merge, and the exists() scan is cheap.
    return F.when(has_pair, fold).otherwise(syms)


def bpe_train(
    df: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    (merges, symbol_table) where merges is
    [(rank, left_sym, right_sym, pair_count), ...] and symbol_table is
    the final (word, freq, syms) DataFrame with all merges applied.

    Ties on pair_count break lexicographically (left_sym, right_sym) —
    fully deterministic across engines, partitionings, and runs.
    Driver state per iteration: ONE row (the argmax pair)."""
    cur = (
        word_counts(df, text_col)
        .select("word", "freq", to_symbols(F.col("word")).alias("syms"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(cur)
            .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pair_count"] < min_count:
            break
        l, r, cnt = top[0]["left_sym"], top[0]["right_sym"], top[0]["pair_count"]
        merges.append((rank, l, r, int(cnt)))
        nxt = cur.withColumn("syms", apply_merge(F.col("syms"), l, r)).localCheckpoint(
            eager=True
        )
        cur.unpersist()
        cur = nxt
    return merges, cur


def encode_word(word: str, merges: Iterable[tuple[str, str]]) -> list[str]:
    """Pure-Python mirror of to_symbols + apply_merge-in-rank-order.
    Used by the Arrow encoder and as the exactness reference."""
    syms = list(word) + [END]
    for left, right in merges:
        out: list[str] = []
        for x in syms:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        syms = out
    return syms


def encode_corpus(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) per document —
    Arrow-batched mapInPandas, merge list shipped by closure (small:
    vocab-sized, never corpus-sized). No shuffle; inherits scan
    partitioning."""
    import re

    ws = re.compile(r"\s+")
    out_schema = f"{id_col} long, bpe_tokens array<string>, n_bpe_tokens long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf[text_col].astype(str):
                toks: list[str] = []
                for w in ws.split(text.lower()):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w, merges)
                        cache[w] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "bpe_tokens": toks_col, "n_bpe_tokens": n_col}
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
