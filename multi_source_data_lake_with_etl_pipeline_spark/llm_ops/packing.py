"""Sequence packing: assign documents to fixed-token-budget training
sequences — the step between a curated corpus and a pretraining
dataloader.

Two packing disciplines, matching what real pipelines use:

- ``pack_streaming`` (GPT-style concat-and-cut): conceptually
  concatenate all tokens in a deterministic document order and cut
  every ``budget`` tokens; documents may straddle a cut. Pure window
  arithmetic over an exclusive running sum — fully SQL-expressible,
  hash-checkable against a DuckDB oracle, and at scale it is one sort
  per packing group (the window) and nothing else.
- ``pack_greedy`` (no-straddle bins): walk documents in order, close
  the current sequence when the next document would overflow the
  budget. The bin id is a *running-state* function (each decision
  depends on the previous bin's fill), not a prefix-sum — so it runs
  as an Arrow-batched ``applyInPandas`` per packing group, the
  documented escape hatch for genuinely sequential semantics. Groups
  (e.g. source shards) pack independently and in parallel; within a
  group the walk is a tight numpy loop over one Arrow batch.

Scale notes: ``pack_streaming`` is the 100 TB default — a single
window sort per group, no Python. ``pack_greedy`` shuffles once on the
group key and runs Python per group; with per-source sharding a 100 TB
corpus becomes thousands of independent ~10 GB walks. A global (no
group) greedy pack is inherently sequential — callers get one group
and should prefer ``pack_streaming`` instead.

Oversized documents (n_tokens > budget): ``pack_streaming`` lets them
span multiple cuts (their tokens still appear exactly once);
``pack_greedy`` gives them a bin of their own (real packers then
truncate or split downstream).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text_stats import TOKEN_RE


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``n_tokens`` (BPE-ish pre-tokenizer count, JVM regexp)."""
    return df.withColumn(
        "n_tokens",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)).cast("long"),
    )


def pack_streaming(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """Concat-and-cut packing. Adds:

    - ``seq_id``    — which sequence the document STARTS in
      (floor(exclusive_cumsum / budget)),
    - ``seq_offset`` — token offset of the document within that
      sequence,
    - ``spans_cut`` — true when the document crosses a sequence
      boundary (its tail spills into seq_id+1...).

    One window sort per group; zero Python. Deterministic given a
    unique ``order_col``.
    """
    w = Window.orderBy(order_col)
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(order_col)
    start = F.coalesce(
        F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    # Integer DIV/%, not double division — exact for any corpus size.
    return (
        df.withColumn("_tok_start", start)
        .withColumns(
            {
                "seq_id": F.expr(f"_tok_start DIV {int(budget)}"),
                "seq_offset": F.col("_tok_start") % budget,
                "spans_cut": (
                    (F.col("_tok_start") % budget) + F.col(token_col) > budget
                ),
            }
        )
        .drop("_tok_start")
    )


def pack_greedy(
    df: DataFrame,
    budget: int,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str | None = None,
) -> DataFrame:
    """No-straddle greedy packing. Adds ``bin_id`` (0-based per group)
    and ``bin_fill`` (tokens in the bin AFTER this document). A
    document larger than ``budget`` occupies a bin alone.

    Runs as one Arrow batch per group via ``applyInPandas``; output
    schema = input schema + (bin_id long, bin_fill long).
    """
    gcol = group_col or "_g"
    src = df if group_col is not None else df.withColumn(gcol, F.lit(0))
    # Fresh StructType — StructType.add MUTATES, and src.schema is the
    # DataFrame's cached schema object.
    schema = T.StructType(
        list(src.schema.fields)
        + [T.StructField("bin_id", T.LongType()), T.StructField("bin_fill", T.LongType())]
    )

    def walk(pdfs: Iterable[pd.DataFrame] | pd.DataFrame) -> pd.DataFrame:
        pdf = pdfs if isinstance(pdfs, pd.DataFrame) else next(iter(pdfs))
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = []
        fills = []
        bin_id, fill = 0, 0
        for t in toks:
            t = int(t)
            if fill > 0 and fill + t > budget:
                bin_id += 1
                fill = 0
            fill += t
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out = src.groupBy(gcol).applyInPandas(walk, schema=schema)
    return out if group_col is not None else out.drop(gcol)


def chunk_words(
    df: DataFrame,
    chunk_size: int = 100,
    overlap: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking: split each document into word windows
    of ``chunk_size`` with ``overlap`` words shared between neighbors
    (stride = chunk_size - overlap) — the F18 chunking slot done as a
    real operator (reference chunks record BATCHES for transport,
    ``common_utils.py``; a training pipeline chunks TEXT for the model
    context window).

    Emits (id, chunk_id, chunk_text, n_chunk_words); every doc yields
    ≥ 1 chunk (short docs → one whole-doc chunk); a NULL text yields
    none. All JVM expressions — per-row sequence/slice + posexplode,
    no shuffle, no Python; output row count is Σ ceil(words/stride),
    so the op streams at scan speed on any corpus size.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    from .text_stats import words

    stride = chunk_size - overlap
    # Token array bound behind its own projection — the chunk transform
    # slices it once per chunk, and a same-Project alias re-inlines
    # (re-splits) per reference.
    base = df.select(
        F.col(id_col), F.col(text_col), words(F.col(text_col)).alias("_w")
    )
    w = F.col("_w")
    n = F.size(w)
    n_chunks = (
        F.lit(1) + F.ceil(F.greatest(n - chunk_size, F.lit(0)) / F.lit(float(stride)))
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(w, i * stride + 1, chunk_size),
    )
    # NULL text → NO chunks. Without the guard, greatest(NULL, 0) = 0
    # (Spark greatest skips NULLs) silently fabricates one empty chunk
    # per NULL doc. posexplode_outer + post-Generate null filter drops
    # the NULL-array rows while avoiding the inner variant's inferred
    # pre-Generate filter, which would inline the whole chunk HOF twice
    # (see dedup._distinct_shingles).
    chunks = F.when(F.col(text_col).isNotNull(), chunks)
    return (
        base.select(F.col(id_col), F.posexplode_outer(chunks).alias("chunk_id", "_cw"))
        .filter(F.col("chunk_id").isNotNull())
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.col("_cw")).alias("chunk_text"),
            F.size(F.col("_cw")).cast("long").alias("n_chunk_words"),
        )
    )
