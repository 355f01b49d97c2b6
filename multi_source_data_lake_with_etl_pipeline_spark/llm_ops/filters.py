"""Heuristic document-quality filters for pretraining-corpus curation:
the publicly documented C4 (Raffel et al., JMLR 2020 §2.2) and Gopher
(Rae et al., 2021, Appendix A) rule families, plus cross-corpus line
deduplication (CCNet-style boilerplate removal).

Reference parity: the reference flags records with config-driven
validation rules and keeps them (``src/validators/data_validators.py:56-109``);
this module is the documents-table counterpart — every rule is a
JVM-side column expression over one narrow scan (split / HOF / regexp),
zero Python UDFs, zero shuffles for the per-doc rule sets. Only
``dedup_lines_corpus`` shuffles (twice — the line-frequency count and
the per-doc regroup), which is the minimum any cross-document operator
can do.

Exactness: every ratio rule is expressed as an integer cross-multiply
(``a * den <= b * num``) instead of a floating ratio, so DuckDB oracles
reproduce the flags bit-for-bit with no rounding traps.

At 100 TB: per-doc flag computation is scan-speed; line dedup's first
shuffle carries (line_hash, doc_id) pairs — 8-byte keys, partial
count upstream of the exchange — and the regroup shuffles only docs
that survive, partitioned by doc_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import words

# Gopher Table A1 thresholds (public).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
GOPHER_MAX_SYMBOL_RATIO_PCT = 10  # '#'/'...' per word < 0.1
GOPHER_MAX_BULLET_PCT = 90        # ≤ 90% of lines start with a bullet
GOPHER_MAX_ELLIPSIS_PCT = 30      # ≤ 30% of lines end with ellipsis
GOPHER_MIN_ALPHA_WORD_PCT = 80    # ≥ 80% of words contain a letter
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPWORD_HITS = 2      # ≥ 2 distinct stopwords present

# C4 rules (public): line kept iff it ends in terminal punctuation and
# has ≥ 5 words and doesn't mention javascript; page dropped if it
# contains "lorem ipsum" or "{" or has < 3 kept lines.
C4_MIN_LINE_WORDS = 5
C4_MIN_KEPT_LINES = 3
_TERMINAL_RE = r"""[.!?"']$"""


def _lines(text: Column) -> Column:
    """Trimmed lines (empty lines removed)."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )


def gopher_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher quality flags + the composite keep bit.

    Adds one boolean column per rule (``gopher_*``) and ``gopher_keep``
    (AND of all rules). All counts are computed from ONE ``words()``
    array projection — a narrow map over the corpus.
    """
    t = F.col(text_col)
    # Bind the token/line arrays behind their own projection: the
    # rules below reference them ~10×, and a same-Project alias
    # re-inlines (re-splits) per reference.
    df = df.withColumns({"_gw": words(t), "_gln": _lines(t)})
    w = F.col("_gw")
    ln = F.col("_gln")
    nw = F.size(w).cast("long")
    n_lines = F.size(ln).cast("long")
    word_chars = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    # symbols: '#' occurrences + ellipsis occurrences ('...' or '…')
    n_hash = F.length(t) - F.length(F.regexp_replace(t, r"#", ""))
    n_ellipsis = F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0)).cast("long")
    n_sym = (n_hash + n_ellipsis).cast("long")
    n_bullet = F.size(F.filter(ln, lambda l: l.rlike(r"^[-*•]"))).cast("long")
    n_ell_end = F.size(F.filter(ln, lambda l: l.rlike(r"(\.\.\.|…)$"))).cast("long")
    n_alpha = F.size(F.filter(w, lambda x: x.rlike(r"[A-Za-z]"))).cast("long")
    n_stop = F.size(
        F.array_intersect(
            F.transform(w, lambda x: F.lower(x)),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    flags = {
        "gopher_word_count_ok": (nw >= GOPHER_MIN_WORDS) & (nw <= GOPHER_MAX_WORDS),
        # 3 ≤ word_chars / nw ≤ 10, integer cross-multiplied (nw > 0 guard:
        # a 0-word doc fails the word-count rule anyway; keep the flag
        # well-defined as False).
        "gopher_mean_word_len_ok": (nw > 0)
        & (word_chars >= GOPHER_MIN_MEAN_WORD_LEN * nw)
        & (word_chars <= GOPHER_MAX_MEAN_WORD_LEN * nw),
        # n_sym / nw < 0.1  ⟺  n_sym * 100 < nw * 10
        "gopher_symbol_ratio_ok": (nw > 0) & (n_sym * 100 < nw * GOPHER_MAX_SYMBOL_RATIO_PCT),
        # bullet lines ≤ 90% of lines (0-line docs pass trivially)
        "gopher_bullet_ok": n_bullet * 100 <= n_lines * GOPHER_MAX_BULLET_PCT,
        "gopher_ellipsis_ok": n_ell_end * 100 <= n_lines * GOPHER_MAX_ELLIPSIS_PCT,
        # alpha words ≥ 80%
        "gopher_alpha_word_ok": (nw > 0) & (n_alpha * 100 >= nw * GOPHER_MIN_ALPHA_WORD_PCT),
        "gopher_stopword_ok": n_stop >= GOPHER_MIN_STOPWORD_HITS,
    }
    out = df.withColumns(flags).drop("_gw", "_gln")
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def c4_clean(df: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 line filter + page rules.

    Adds:
      c4_n_lines   trimmed non-empty input lines
      c4_n_kept    lines ending in terminal punctuation, ≥ 5 words,
                   no 'javascript' mention
      c4_text      the kept lines rejoined with '\\n' (line order kept)
      c4_keep      page rule: ≥ 3 kept lines, no 'lorem ipsum', no '{'
    """
    t = F.col(text_col)
    # Lines and the kept-line array bound once each (the kept filter
    # tokenizes every line — re-inlining it per reference would run
    # that per OUTPUT COLUMN).
    df = df.withColumn("_c4ln", _lines(t)).withColumn(
        "_c4kept",
        F.filter(
            F.col("_c4ln"),
            lambda l: l.rlike(_TERMINAL_RE)
            & (F.size(words(l)) >= C4_MIN_LINE_WORDS)
            & ~F.lower(l).contains("javascript"),
        ),
    )
    ln, kept = F.col("_c4ln"), F.col("_c4kept")
    return df.withColumns(
        {
            "c4_n_lines": F.size(ln).cast("long"),
            "c4_n_kept": F.size(kept).cast("long"),
            "c4_text": F.concat_ws("\n", kept),
            "c4_keep": (F.size(kept) >= C4_MIN_KEPT_LINES)
            & ~F.lower(t).contains("lorem ipsum")
            & ~t.contains("{"),
        }
    ).drop("_c4ln", "_c4kept")


def dedup_lines_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_doc_freq: int = 1,
) -> DataFrame:
    """Cross-corpus line deduplication (CCNet-style boilerplate strip):
    drop every line that occurs in more than ``max_doc_freq`` distinct
    documents, rebuild each document from its surviving lines in
    original order.

    Returns (id, text, n_lines, n_kept) with ``text`` rewritten.
    Documents whose lines are ALL boilerplate come back with empty
    text (kept, not dropped — dropping is the caller's policy).

    Shape: posexplode lines → count distinct docs per md5(line) (one
    shuffle, partial agg map-side; md5 so external engines reproduce
    the key) → semi-filter surviving (id, pos, line) → regroup per doc
    (second shuffle) sorting by pos inside an array aggregate. Hot
    boilerplate lines are exactly the high-frequency keys — the count
    aggregate absorbs them map-side, and they are DROPPED before the
    regroup shuffle, so skew decreases downstream.
    """
    # posexplode_outer + null filter: the inner variant's inferred
    # pre-Generate filter inlines the line-splitting expression twice
    # (see dedup._distinct_shingles).
    lines = (
        df.select(
            F.col(id_col),
            F.posexplode_outer(_lines(F.col(text_col))).alias("_pos", "_line"),
        )
        .filter(F.col("_pos").isNotNull())
        .withColumn("_h", F.md5(F.col("_line")))
    )
    freq = lines.groupBy("_h").agg(
        F.count_distinct(id_col).alias("_docs")
    )
    survivors = lines.join(
        freq.filter(F.col("_docs") <= max_doc_freq).select("_h"), "_h", "left_semi"
    )
    rebuilt = survivors.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col), F.size(_lines(F.col(text_col))).cast("long").alias("n_lines")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
