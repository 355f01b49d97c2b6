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
