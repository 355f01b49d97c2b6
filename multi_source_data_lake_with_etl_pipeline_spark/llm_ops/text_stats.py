"""Text analysis for training-data curation: quality stats, token
counting, language ID, document fingerprinting.

All JVM-side expressions (split/regexp/aggregate) — no Python UDFs, so
a 100 TB documents table profiles at full scan speed with one narrow
pass and zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language ID (the classic "count function words" trick).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "to", "and", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "para", "con"],
}

# BPE-ish tokenization: word pieces = letter runs, digit runs, or a
# single non-space symbol (a practical proxy for subword pre-tokenizers).
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokens (empty-string-free)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality stats. Integer/exact outputs where possible
    (cross-engine comparable without rounding). The token array is
    bound as its own column first — three stats reference it, and a
    same-Project alias re-computes the split per reference."""
    t = F.col(text_col)
    w = F.col("_w_ts")
    return (
        df.withColumn("_w_ts", words(t))
        .withColumns(
            {
                "stat_n_chars": F.length(t).cast("long"),
                "stat_n_words": F.size(w).cast("long"),
                "stat_word_chars": F.aggregate(
                    w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
                ),
                "stat_n_tokens": F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), 0)).cast("long"),
                "stat_n_digits": F.length(t) - F.length(F.regexp_replace(t, r"[0-9]", "")),
                "stat_n_punct": F.length(t)
                - F.length(F.regexp_replace(t, r"[^\w\s]", "")),
                "stat_n_stopwords": F.size(
                    F.filter(w, lambda x: F.lower(x).isin(LANG_STOPWORDS["en"]))
                ).cast("long"),
            }
        )
        .drop("_w_ts")
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword signal
    + low symbol noise (the usual heuristic pre-filter stack)."""
    s = text_stats(df, text_col)
    len_ok = (F.col("stat_n_words") >= 10) & (F.col("stat_n_words") <= 100_000)
    stop_ratio = F.col("stat_n_stopwords") / F.greatest(F.col("stat_n_words"), F.lit(1))
    punct_ratio = F.col("stat_n_punct") / F.greatest(F.col("stat_n_chars"), F.lit(1))
    score = (
        len_ok.cast("double") * 0.4
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
        + (1 - F.least(punct_ratio * 5, F.lit(1.0))) * 0.3
    )
    # Integer basis-point variant (0..10000): same score expressed with
    # exact integer arithmetic + floor, so it is bit-identical across
    # engines (the double score can land on round-half ties). The
    # fractional terms are k/d with d ≤ doc length, so the quotient is
    # ≥ 1/d away from any integer — far outside double ulp — and floor
    # is unambiguous.
    nw = F.greatest(F.col("stat_n_words"), F.lit(1))
    nc = F.greatest(F.col("stat_n_chars"), F.lit(1))
    score_bp = (
        len_ok.cast("long") * 4000
        + F.floor(F.least(F.col("stat_n_stopwords") * 5, nw) * 3000 / nw)
        + (3000 - F.floor(F.least(F.col("stat_n_punct") * 5, nc) * 3000 / nc))
    )
    return s.withColumns(
        {"quality_score": F.round(score, 4), "quality_score_bp": score_bp}
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: score per language = # of stopword
    hits; argmax wins (ties broken by language-code order). Token array
    bound once — every language's scorer references it."""
    w = F.col("_w_lid")

    # NB: a two-parameter lambda in F.filter means (element, index) to
    # PySpark — bind the stopword list via a factory, not a default arg.
    def hits(sw: list[str]):
        return F.size(F.filter(w, lambda x: F.lower(x).isin(sw)))

    scored = df.withColumn("_w_lid", words(F.col(text_col))).withColumns(
        {f"_score_{lang}": hits(sw) for lang, sw in LANG_STOPWORDS.items()}
    ).drop("_w_lid")
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"_score_{lg}") for lg in langs])
    pred = F.lit("unknown")
    for lg in reversed(langs):  # earlier langs win ties (checked last)
        pred = F.when((F.col(f"_score_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return scored.withColumn("pred_lang", pred).drop(*[f"_score_{lg}" for lg in langs])


def shingles_of_words(w: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an already-tokenized array column.

    Prefer binding the token array behind its own projection first
    (``df.select(words(text).alias("_w"))`` then build from
    ``F.col("_w")``): this expression references ``w`` ~3·n_grams
    times, and if ``w`` is the inline ``words(text)`` EXPRESSION rather
    than an attribute, Catalyst materializes the split/filter once per
    reference — a measured multi-x slowdown on shingle-heavy scans.
    """
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + j + 1) for j in range(n)])
    )
    return F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> (distinct not applied).

    Documents with fewer than ``n`` words yield an EMPTY array (so
    downstream array_min/explode produce NULL/no rows, matching the SQL
    oracles' LEFT-JOIN-NULL shape). The transform branch is guarded by
    CASE WHEN, which Spark evaluates lazily per row — without the guard,
    size(w)-n < 0 makes sequence() descend and element_at() throw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's ANSI mode.
    """
    return shingles_of_words(words(text), n)


def fingerprint(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprint = lexicographic min of md5(shingle) — a
    1-permutation MinHash usable as a cheap near-dup blocking key.
    md5 (not xxhash) so external engines can reproduce it.

    The token array is bound as its own column first (see
    ``shingles_of_words``): Catalyst re-inlines a same-Project alias
    once per element_at reference, re-running the split per shingle."""
    return (
        df.withColumn("_w", words(F.col(text_col)))
        .withColumn(
            "fingerprint",
            F.array_min(
                F.transform(shingles_of_words(F.col("_w"), n), lambda s: F.md5(s))
            ),
        )
        .drop("_w")
    )


def repetition_stats(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """Intra-document repetition (Gopher-style quality rule: drop docs
    whose duplicate-n-gram fraction is high — boilerplate, spam, OCR
    loops).

    Adds, per doc:
      rep_total_ngrams    total word n-grams
      rep_distinct_ngrams distinct word n-grams
      rep_ratio_bp        floor(10000 * duplicated / total), 0 if no grams
      rep_top_share_bp    floor(10000 * max-single-gram-count / total)

    All computed inside ONE array projection (shingles → array_distinct
    / HOF fold) — no explode, no shuffle: the 100 TB version is a
    narrow full-scan column, same as text_stats. Integer basis points
    so external engines reproduce it exactly (floor of k/d with d ≤
    gram count is ulp-safe, see quality_score).
    """
    # Bind the gram array as a real column: it is referenced by four
    # expressions below, and a same-Project alias re-inlines (and
    # re-computes the underlying split) per reference.
    sh = F.col("_sh_rep")
    total = F.size(sh).cast("long")
    distinct = F.size(F.array_distinct(sh)).cast("long")
    # max single-gram multiplicity = longest equal-run in the SORTED
    # gram array, found with one linear fold (struct accumulator:
    # previous gram, current run, best run). O(g log g) per row — the
    # naive per-distinct-gram recount is O(g²) and melts on long docs.
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    top = F.aggregate(
        F.array_sort(sh),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(one).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(one),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    safe_total = F.greatest(total, F.lit(1).cast("long"))
    return (
        df.withColumn("_w_rep", words(F.col(text_col)))
        .withColumn("_sh_rep", shingles_of_words(F.col("_w_rep"), n))
        .withColumns(
            {
                "rep_total_ngrams": total,
                "rep_distinct_ngrams": distinct,
                "rep_ratio_bp": F.floor((total - distinct) * 10000 / safe_total).cast("long"),
                "rep_top_share_bp": F.floor(top * 10000 / safe_total).cast("long"),
            }
        )
        .drop("_w_rep", "_sh_rep")
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS local fingerprinting scheme): hash every k-token gram,
    slide a window of ``w`` consecutive gram hashes, keep each window's
    MINIMUM — the selected set is the document's fingerprints, with the
    paper's guarantee that any match of at least w+k-1 tokens shares at
    least one fingerprint (vs ``fingerprint``'s single global min,
    which only catches whole-document near-identity).

    md5 strings (not xxhash) as the gram hash so external engines
    reproduce the selection bit-exactly; min is lexicographic. Output:
    (id, fp array<string> DISTINCT selected hashes). Docs shorter than
    k+w-1 tokens emit an empty array.

    100 TB shape: pure per-row HOFs — lower → split → gram-hash
    transform → window-min transform → array_distinct; fingerprinting a
    corpus is one narrow map stage with ZERO shuffles (contrast with the
    k-gram postings index, which explodes to token granularity).
    Overlap detection downstream explodes only the SELECTED prints
    (~n_tokens/((w+1)/2) expected density, the paper's 2/(w+1) rate).
    """
    lw = F.col("_lw")
    n = F.size(lw)
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(lw, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = F.col("_g")
    m = F.size(g)
    fps = F.when(
        m >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), m - w),
                lambda j: F.array_min(F.slice(g, j + 1, w)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # each derived array bound behind its OWN projection — inlined, the
    # window-min transform would re-evaluate the gram transform per
    # window (the same-Project alias re-inlining trap; see
    # spans.kgram_positions)
    return (
        df.withColumn("_lw", words(F.lower(F.col(text_col))))
        .withColumn("_g", grams)
        .withColumn("fp", fps)
        .drop("_lw", "_g")
    )


def winnow_prints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exploded winnowing-prints table: one (id, *keep_cols, f) row per
    selected fingerprint — the REUSABLE artifact every overlap/leakage
    consumer probes, built once per corpus instead of once per
    consumer (the precomputed-postings pattern from spans.py, applied
    to fingerprints; VERDICT r5 #8). explode_outer + null filter keeps
    the winnow HOF chain out of an inferred pre-Generate filter."""
    fps = winnow_fingerprints(df, text_col, id_col, k, w)
    return (
        fps.select(id_col, *keep_cols, F.explode_outer("fp").alias("f"))
        .filter(F.col("f").isNotNull())
    )


def winnow_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    prints: DataFrame | None = None,
) -> str:
    """Materialize the corpus' DISTINCT fingerprints as parquet — the
    amortized artifact for a RECURRING contamination check: the train
    set is fingerprinted ONCE, and every future eval/holdout batch
    probes the index with a semi-join instead of re-fingerprinting
    100 TB of train text (same discipline as dedup.minhash_index_build
    / spans.gram_index_build). ``prints``: precomputed
    ``winnow_prints`` output for ``df``."""
    pr = prints if prints is not None else winnow_prints(
        df, text_col, id_col, k, w
    )
    pr.select("f").distinct().write.mode("overwrite").parquet(path)
    return path


def winnow_leakage_probe(
    new_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    w: int = 5,
    prints: DataFrame | None = None,
) -> DataFrame:
    """Doc ids of ``new_docs`` sharing >= 1 winnowing fingerprint with
    the indexed corpus (any common token run of >= w+k-1 tokens, the
    winnowing guarantee) — the incremental contamination alarm. Only
    the BATCH is fingerprinted; the train side is index gram keys.
    ``prints``: precomputed ``winnow_prints`` output for the batch."""
    spark = new_docs.sparkSession
    pr = prints if prints is not None else winnow_prints(
        new_docs, text_col, id_col, k, w
    )
    idx = spark.read.parquet(index_path)
    return pr.join(idx, "f", "left_semi").select(id_col).distinct()
