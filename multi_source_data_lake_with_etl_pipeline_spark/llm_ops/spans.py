"""Duplicate-span detection: maximal cross-document repeated token
spans (the span-level third of the dedup triad — document-level
near-dup in ``dedup.py``, line-level in ``filters.py``).

Public-knowledge basis: "Deduplicating Training Data Makes Language
Models Better" (Lee et al. 2022) — its ExactSubstr pass removes
repeated substrings of >= 50 tokens. The suffix-array construction
there is single-machine; the Spark-first equivalent is a k-gram
postings index: a span of length >= k repeats across documents iff
every one of its k-gram windows repeats, so duplicated k-gram
POSITIONS, merged into maximal intervals, recover exactly the
repeated spans of length >= k (cross-document; within-document
repeats are out of scope by the distinct-doc frequency test).

Shape at 100 TB:
- postings explode: ~n_tokens rows per doc (linear, the unavoidable
  index size), one shuffle on the gram key for document frequency,
  one semi-join shuffle back to positions, one per-doc window. All
  linear; no pairwise blowup (this never materializes doc pairs).
- gram keys here are the literal k-token strings so the DuckDB oracle
  is collision-free exact; production at 10^13 tokens would switch
  the key to xxhash64(gram) (8 bytes vs ~50: ~6x shuffle-volume cut,
  collision odds ~(n^2/2)/2^64 — at 10^12 distinct grams that's
  ~2.7% chance of ONE colliding pair corpus-wide, which only ever
  merges two unrelated grams into one false duplicated position).
- the interval merge is gaps-and-islands over (doc, start): running
  max-end, island break where start > previous max — one window
  partition per document, no cross-doc state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_stats import words


def kgram_positions(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, gram): every k-token window, 0-based token position.
    Docs shorter than k tokens contribute nothing (guarded sequence —
    no descending-range ANSI trap on short docs).

    The lowercased token array is bound behind its own projection:
    inlined, the split/lower expression would re-evaluate inside EVERY
    window's slice() — O(n_tokens × split cost) per doc (the
    same-Project alias re-inlining trap, see dedup._shingle_set_table)."""
    base = df.select(
        F.col(id_col),
        F.transform(words(F.col(text_col)), lambda t: F.lower(t)).alias("_w"),
    )
    w = F.col("_w")
    n = F.size(w)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.struct(i.alias("pos"), F.concat_ws(" ", F.slice(w, i + 1, k)).alias("gram"))
    )
    # explode_outer + null filter: inner explode's inferred filter
    # would inline the whole windowed-gram transform twice (see
    # dedup._distinct_shingles).
    return (
        base.select(F.col(id_col), F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
    )


def duplicated_positions(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: DataFrame | None = None,
) -> DataFrame:
    """(id, pos) of every k-gram window that also appears in ANOTHER
    document. One df-shuffle + one semi-join; grams never leave the
    exchange wider than (gram, id) pairs. ``positions``: precomputed,
    MATERIALIZED ``kgram_positions`` output for exactly ``df`` — the
    postings-reuse path the parity audits take so build/delta/rebuild
    legs mine the corpus once (postings are row-local, so a filtered
    shared table is bit-identical to a per-leg recompute)."""
    pos = positions if positions is not None else kgram_positions(
        df, k, text_col, id_col
    )
    shared = (
        pos.select("gram", id_col)
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .filter(F.col("ndocs") >= 2)
        .select("gram")
    )
    return pos.join(shared, "gram", "left_semi").select(id_col, "pos")


def duplicate_span_profile(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: DataFrame | None = None,
    profile_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document profile of maximal cross-doc repeated spans:

      n_dup_spans   maximal merged intervals of duplicated windows
      dup_tokens    tokens covered by those spans (union length)
      n_tokens      document token count

    Every document appears (docs with no duplicated span report 0/0) —
    the downstream filter/trim decision needs the zeros too.
    ``positions``: precomputed postings (see duplicated_positions).
    ``profile_docs``: emit profiles ONLY for this subset of ``df``
    (duplicate detection still runs against the FULL corpus). The
    subset restriction lands BEFORE the per-doc interval-merge window
    and the totals tokenization — restricting 100 TB of corpus to one
    batch must not window-sort or re-tokenize the other 99%."""
    dup = duplicated_positions(df, k, text_col, id_col, positions=positions)
    target = df
    if profile_docs is not None:
        target = profile_docs
        dup = dup.join(profile_docs.select(id_col), id_col, "left_semi")
    return _profile_from_positions(target, dup, k, text_col, id_col)


def _profile_from_positions(
    df: DataFrame, dup: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """Shared tail of the span profiles: merge (id, pos) windows into
    maximal intervals (gaps-and-islands) and report per-doc span count,
    covered tokens, and totals — zeros included."""
    iv = dup.select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    by_start = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(by_start.rowsBetween(Window.unboundedPreceding, -1))
    iv = iv.withColumn(
        "new_island", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int")
    ).withColumn(
        "island",
        F.sum("new_island").over(by_start.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = iv.groupBy(id_col, "island").agg(
        F.min("s").alias("span_start"), F.max("e").alias("span_end")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens"),
    )
    totals = df.select(
        F.col(id_col), F.size(words(F.col(text_col))).cast("long").alias("n_tokens")
    )
    return (
        totals.join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )


def gram_index_build(
    df: DataFrame,
    path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    positions: DataFrame | None = None,
) -> str:
    """Materialize the corpus k-gram postings (id, pos, gram) as
    parquet — the amortized artifact for CONTINUOUS span dedup: each
    ingestion batch joins its own grams against the index instead of
    re-mining the whole corpus (same discipline as
    ``dedup.minhash_index_build``). ``positions``: precomputed postings
    for ``df`` (see duplicated_positions)."""
    if positions is None:
        positions = kgram_positions(df, k, text_col, id_col)
    positions.write.mode("overwrite").parquet(path)
    return path


def incremental_span_profile(
    new_docs: DataFrame,
    index_path: str,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
    positions: DataFrame | None = None,
) -> DataFrame:
    """Span profile of a NEW batch against an indexed corpus: a window
    is duplicated iff its gram exists in the index (any base doc) or in
    another document of the batch. With base/new doc ids disjoint this
    EQUALS duplicate_span_profile(base ∪ new) restricted to the batch
    (audited by ``span_incremental_invariant``) — while touching only
    index GRAM KEYS, never base text. With ``append``, the batch's
    postings join the index for the next batch. ``positions``:
    precomputed postings for ``new_docs`` (see duplicated_positions)."""
    spark = new_docs.sparkSession
    pos = positions if positions is not None else kgram_positions(
        new_docs, k, text_col, id_col
    )
    idx_grams = spark.read.parquet(index_path).select("gram").distinct()
    batch_shared = (
        pos.select("gram", id_col)
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram")
    )
    # ONE semi-join of positions against the UNION of duplicated gram
    # keys (index ∪ batch-shared) — gram keys are far smaller than
    # positions, and each (id, pos) occurs once in ``pos``, so the old
    # two-semi-join + union + positions-distinct plan spent an extra
    # exchange deduplicating rows that were never duplicated.
    dup_keys = idx_grams.unionByName(batch_shared).distinct()
    dup = pos.join(dup_keys, "gram", "left_semi").select(id_col, "pos")
    out = _profile_from_positions(new_docs, dup, k, text_col, id_col)
    if append:
        out = out.localCheckpoint(eager=True)  # materialize before the index grows
        pos.write.mode("append").parquet(index_path)
    return out


def redundant_positions(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos) of k-gram windows that are duplicated cross-doc AND
    whose document is not the gram's keeper (min doc id): the removal
    set under the keep-first-occurrence policy. Deterministic — the
    keeper is a pure function of the corpus, not of scheduling."""
    pos = kgram_positions(df, k, text_col, id_col)
    gstat = (
        pos.groupBy("gram")
        .agg(
            F.count_distinct(id_col).alias("ndocs"), F.min(id_col).alias("keeper")
        )
        .filter(F.col("ndocs") >= 2)
    )
    return (
        pos.join(gstat, "gram", "inner")
        .filter(F.col(id_col) != F.col("keeper"))
        .select(id_col, "pos")
    )


def trim_duplicate_spans(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Rewrite each document with its redundant spans removed
    (single-space rejoin): (id, text_trimmed, n_removed, n_tokens).
    The keeper document of every gram keeps its copy; all other
    occurrences of spans >= k tokens are cut — the actionable
    ExactSubstr pass.

    Spark never explodes to token granularity for the rebuild: merged
    intervals are collected per doc (a handful of structs) and the cut
    is a per-row indexed array filter — one narrow projection, vs the
    oracle SQL's token-level join."""
    red = redundant_positions(df, k, text_col, id_col)
    iv = red.select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + F.lit(k - 1)).alias("e")
    )
    by_start = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(by_start.rowsBetween(Window.unboundedPreceding, -1))
    iv = iv.withColumn(
        "new_island", (F.col("s") > F.coalesce(prev_max_e, F.lit(-1))).cast("int")
    ).withColumn(
        "island",
        F.sum("new_island").over(by_start.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = iv.groupBy(id_col, "island").agg(
        F.min("s").alias("ss"), F.max("e").alias("se")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("ss", "se")).alias("cuts"),
        F.sum(F.col("se") - F.col("ss") + 1).alias("n_removed"),
    )
    # match is case-folded (kgram_positions lowercases); the rewrite
    # keeps the original-case tokens at the kept positions.
    base = df.select(F.col(id_col), words(F.col(text_col)).alias("w"))
    j = base.join(per_doc, id_col, "left")
    cuts = F.coalesce(F.col("cuts"), F.array().cast("array<struct<ss:int,se:int>>"))
    kept = F.filter(
        F.col("w"),
        lambda x, i: ~F.exists(
            cuts, lambda c: (i >= c["ss"]) & (i <= c["se"])
        ),
    )
    return j.select(
        id_col,
        F.concat_ws(" ", kept).alias("text_trimmed"),
        F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        F.size(F.col("w")).cast("long").alias("n_tokens"),
    )
