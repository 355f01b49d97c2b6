"""Corpus-vocabulary statistics: document-frequency vocabulary build +
out-of-vocabulary (OOV) rate scoring.

The OOV rate against a corpus-derived vocabulary is a classic
integer-exact stand-in for language-model perplexity in curation
stacks: garbled/OCR/non-prose documents are exactly the ones whose
tokens fall outside the high-document-frequency vocabulary. (A real
LM perplexity scorer slots into the same two-pass shape — stats pass,
then a scoring scan — but its float log-probs are not reproducible
across engines; the OOV count is.)

Shape at 100 TB:
- vocabulary build: explode distinct tokens → groupBy token with a
  partial-aggregated distinct-doc count (one shuffle carrying (token,
  doc_id) pairs) → filter df >= min_df. The vocabulary is vastly
  smaller than the corpus (type/token ratio), but can still be 10^8
  types at web scale — so nothing here FORCES a broadcast.
- scoring: explode + anti-join on the token key, then a per-doc count.
  AQE broadcasts the vocabulary when it is actually small; past
  broadcast size the anti-join shuffles on the token key, which is the
  correct degradation (both sides hash-partition on a short string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import widen
from .text_stats import words


def build_vocab(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", min_df: int = 5
) -> DataFrame:
    """(token, df) vocabulary: lowercased whitespace tokens appearing
    in at least ``min_df`` distinct documents. Distinct-per-doc before
    the explode, so the shuffle stream is born deduplicated."""
    # explode_outer + null filter at every tokenize-explode below: the
    # inferred pre-Generate filter of inner explode inlines the whole
    # split/transform (2x cost; see dedup._distinct_shingles).
    toks = (
        widen(df)
        .select(
            F.col(id_col),
            F.explode_outer(
                F.array_distinct(
                    F.transform(words(F.col(text_col)), lambda w: F.lower(w))
                )
            ).alias("token"),
        )
        .filter(F.col("token").isNotNull())
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))  # distinct by construction
        .filter(F.col("df") >= min_df)
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 5,
) -> DataFrame:
    """Per-document OOV profile against ``vocab`` (built from ``df``
    itself when not supplied — the usual self-referential corpus pass):

      n_tokens   total (non-distinct) tokens
      n_oov      tokens whose lowercase form is not in the vocabulary
      oov_bp     floor(10000 * n_oov / n_tokens), 0 for empty docs

    Integer basis points — engine-exact, no float division."""
    if vocab is None:
        vocab = build_vocab(df, text_col, id_col, min_df)
    toks = (
        widen(df)
        .select(
            F.col(id_col),
            F.explode_outer(
                F.transform(words(F.col(text_col)), lambda w: F.lower(w))
            ).alias("token"),
        )
        .filter(F.col("token").isNotNull())
    )
    # No forced broadcast: a web-scale vocabulary (10^8 types) exceeds
    # broadcast budgets. AQE broadcasts it when it IS small; otherwise
    # the anti-join shuffles on the 8-byte-ish token key — the correct
    # shape either way.
    oov = (
        toks.join(vocab.select("token"), "token", "left_anti")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_oov"))
    )
    totals = df.select(
        F.col(id_col), F.size(words(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        totals.join(oov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
        )
        .withColumn(
            "oov_bp",
            F.when(
                F.col("n_tokens") > 0,
                F.floor(F.col("n_oov") * 10000 / F.col("n_tokens")),
            )
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information: PMI = ln( (c_xy/N_bg) / ((c_x/N_tok)·(c_y/N_tok)) ).
    The phrase-mining pass a tokenizer-training pipeline runs before
    merging multiword units; complements `build_vocab` (unigrams) and
    `bpe` (subwords).

    All counts are exact integers; PMI is the only double, rounded to
    4 dp (ln of an exact-integer ratio — the bm25/entropy-proven
    cross-engine pattern). Bigrams come from zip_with over the token
    array (explode_outer + null filter: the inner-explode inferred
    filter would inline the array expression twice — see
    tests/test_plans.py shingle-tax pin).

    100 TB shape: two narrow scans (unigram + bigram explode), two
    hash aggregations with map-side partials, then two joins of the
    bigram counts against the unigram count table — vocabulary-sized,
    AQE broadcasts it. Top-k via one final k-row sort.
    """
    from .text_stats import words

    toks = df.select(
        F.transform(words(F.col(text_col)), lambda w: F.lower(w)).alias("w")
    ).persist()
    uni = (
        toks.select(F.explode_outer("w").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_tok"))
    ).persist()
    n_tok = uni.agg(F.sum("c_tok").alias("n_tok"))
    bg = (
        toks.select(
            F.explode_outer(
                F.zip_with(
                    F.slice(F.col("w"), 1, F.greatest(F.size("w") - 1, F.lit(0))),
                    F.slice(F.col("w"), 2, F.greatest(F.size("w") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("bg")
        )
        .filter(F.col("bg").isNotNull())
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
    ).persist()
    # N_bg is the UNFILTERED bigram total — the min_count cut prunes
    # candidates, it must not reweight the probability space
    n_bg = bg.agg(F.sum("c_xy").alias("n_bg"))
    bg = bg.filter(F.col("c_xy") >= min_count)
    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_tok").alias("c_x"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_tok").alias("c_y"))
    scored = (
        bg.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(n_tok)
        .crossJoin(n_bg)
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("long").alias("c_xy"),
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") / F.col("n_bg"))
                    / (
                        (F.col("c_x").cast("double") / F.col("n_tok"))
                        * (F.col("c_y").cast("double") / F.col("n_tok"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)
