"""Corpus-trained bigram language model: train counts in one pass,
score documents by average log-likelihood — the classic statistical
quality filter (KenLM-perplexity filtering in CCNet/C4 pipelines) with
the model trained on the corpus itself (or any reference corpus).

Scale shape — three keyed, partial-aggregated shuffles total:

1. TRAIN bigrams: explode each doc's adjacent word pairs (zip of two
   array slices — no per-character explode) → groupBy (w1, w2) count.
2. TRAIN unigrams: explode words → groupBy word count. Vocabulary size
   is ONE driver scalar (countDistinct).
3. SCORE: explode doc bigrams → left join bigram counts on (w1, w2),
   join unigram counts on w1 → per-doc sum of Laplace-smoothed
   ``ln((c2 + 1) / (c1 + V))`` → one aggregation back to doc grain.

Every join key is a token string pair — in production swap for
``xxhash64`` keys like the dedup modules; kept as strings here so the
DuckDB oracle stays readable. Unseen bigrams smooth to ``1/(c1+V)``;
unseen head words to ``1/V``. Scores are averaged per bigram and
rounded to 4dp (ln() is within 1 ulp on both engines; the summed drift
is ~1e-13, far inside the rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_stats import words


def _tokens(text_col: str):
    return F.transform(words(F.col(text_col)), lambda w: F.lower(w))


def _doc_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, w1, w2) — one row per adjacent token pair, built from two
    array slices zipped per row (narrow; the explode is the only
    fan-out). Token array bound behind its own projection (4 references
    below; a same-Project inline expression re-splits per reference)."""
    df = df.select(F.col(id_col), _tokens(text_col).alias("_ws"))
    ws = F.col("_ws")
    pairs = F.zip_with(
        F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # explode_outer + null filter: inner explode's inferred filter
    # would inline the zip_with/slice pair expression twice (see
    # dedup._distinct_shingles).
    return (
        df.select(id_col, F.explode_outer(pairs).alias("_bg"))
        .filter(F.col("_bg").isNotNull())
        .select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))
    )


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Count tables for the model: (bigram_counts(w1, w2, c2),
    unigram_counts(w1, c1), vocab_size)."""
    bg = _doc_bigrams(corpus, text_col, id_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    toks = corpus.select(F.explode_outer(_tokens(text_col)).alias("w1")).filter(
        F.col("w1").isNotNull()
    )
    unigrams = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.select(F.countDistinct("w1")).collect()[0][0]
    return bigrams, unigrams, int(vocab)


def bigram_lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    unigrams: DataFrame,
    vocab: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc average bigram log-likelihood under the trained model:
    ``(id, n_bigrams, avg_logprob)`` (4dp). Docs with < 2 words have no
    bigrams and drop out (undefined likelihood). Lower = more
    surprising = the curation DROP signal."""
    bg = _doc_bigrams(docs, text_col, id_col)
    v = F.lit(float(vocab))
    scored = (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams, "w1", "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)) + 1)
                / (F.coalesce(F.col("c1"), F.lit(0)) + v)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), 4).alias("avg_logprob"),
    )


def score_corpus_self(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train on the corpus and score the corpus (the self-perplexity
    profile: outliers are boilerplate/garbled docs)."""
    bigrams, unigrams, vocab = train_bigram_lm(corpus, text_col, id_col)
    return bigram_lm_score(corpus, bigrams, unigrams, vocab, text_col, id_col)
