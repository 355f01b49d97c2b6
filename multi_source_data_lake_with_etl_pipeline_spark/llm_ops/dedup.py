"""Near-duplicate detection for training-data curation: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant):

- **exact**: one shuffle on md5(text). Works at any scale.
- **ngram_jaccard_pairs**: exact all-pairs via inverted shingle index —
  the candidate join explodes with document frequency, so hot shingles
  are dropped (``max_df``) exactly like production near-dup pipelines;
  cost is Σ df² over kept shingles, NOT corpus².
- **minhash_lsh**: the 100 TB path. Signatures are computed PER ROW
  with higher-order functions (zero shuffles — a narrow map over the
  corpus); banding turns pair discovery into an equality join on
  (band, band_hash) — no quadratic step anywhere; candidates verified
  with exact Jaccard.
- **simhash**: 64-bit signature via per-shingle hash bit-voting, also
  per-row/shuffle-free; the pigeonhole banding (4×16-bit chunks) finds
  all pairs within hamming distance 3 with equality joins only.

Shuffle hygiene: the inverted index always carries ``xxhash64(shingle)``
(8-byte keys), never shingle strings, and per-doc distinctness comes
from ``array_distinct`` BEFORE the explode, so the (id, key) stream is
born distinct — no dedup shuffle.

Caching contract: the pair-finders persist small intermediates
(signatures / shingle index) that the RETURNED lazy DataFrame still
reads — they cannot be unpersisted here. Intermediates that stop being
referenced (e.g. the pre-``max_df`` shingle table) are unpersisted
eagerly; callers running many unrelated dedup jobs in one session
should ``spark.catalog.clearCache()`` between them (bench.py does).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import shingles, shingles_of_words, words

_LONG_MAX = (1 << 63) - 1


def _shingle_set_table(
    df: DataFrame, text_col: str, id_col: str, n: int, extra: list[str] | None = None
) -> DataFrame:
    """(id, _sh: array<long>) — per-doc distinct shingle hashes, with
    the token array bound behind its OWN projection so the regex
    split/filter evaluates once per row, not once per element_at
    reference inside the shingle transform (Catalyst only refrains
    from re-inlining multi-referenced aliases ACROSS Projects; a
    measured multi-x win on shingle-heavy scans)."""
    w = _widen(df).select(
        id_col, *(extra or []), words(F.col(text_col)).alias("_w")
    )
    return w.select(
        id_col,
        *(extra or []),
        F.array_distinct(
            F.transform(shingles_of_words(F.col("_w"), n), lambda s: F.xxhash64(s))
        ).alias("_sh"),
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id doc per identical text (hash
    groupBy — deterministic keep-first)."""
    h = F.md5(F.col(text_col))
    best = df.withColumn("_h", h).groupBy("_h").agg(F.min(id_col).alias(id_col))
    return df.join(best, id_col, "left_semi")


def _shingle_hash_set(text_col: str, n: int) -> Column:
    """Per-row distinct shingle hashes: array<long>. All narrow ops."""
    return F.array_distinct(
        F.transform(shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
    )


def _widen(df: DataFrame) -> DataFrame:
    """Ensure CPU-heavy narrow stages get cluster-wide parallelism.

    Signature computation is shuffle-free, so it inherits the scan's
    partitioning — a small table read as 1-2 parquet splits would pin
    the whole corpus to 1-2 cores. At real scale the scan already has
    thousands of splits/files and this is a no-op.

    Split-count probe uses ``inputFiles()`` (plan metadata, no Java RDD
    conversion — ``df.rdd.getNumPartitions()`` detoured through an RDD
    materialization on every dedup call). File count under-estimates
    split count for huge files, but a source with >= defaultParallelism
    files never needs widening, which is the only decision made here."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        nfiles = len(df.inputFiles())
    except Exception:  # non-file sources (memory, streaming) — widen
        nfiles = 0
    if nfiles >= target:
        return df
    return df.repartition(target)


# Public alias: other llm_ops modules (decontam, query-site widening of
# projection-only ops) need the same scan-parallelism guard.
widen = _widen


def _with_min_words(df: DataFrame, text_col: str, n: int) -> DataFrame:
    """Drop docs with fewer than ``n`` words before signature-based
    pair-finding: their shingle set is EMPTY, so their Jaccard with
    anything is undefined/0 — but the fold identity would give them all
    an IDENTICAL degenerate signature (all-LONG_MAX MinHash / zero
    SimHash), pairing every short doc with every other short doc:
    a quadratic candidate blowup of guaranteed non-duplicates."""
    return df.filter(F.size(words(F.col(text_col))) >= n)


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    """Inverted-index stream (id, _sk). Distinct by construction
    (array_distinct before explode) — no extra shuffle, and the join
    key is an 8-byte long, not the shingle text.

    ``explode_outer`` + post-explode null filter, NOT plain
    ``explode``: the optimizer infers a ``size(e)>0 AND isnotnull(e)``
    pre-Generate filter for inner explode, INLINING the whole shingle
    expression into the condition and pushing it below the widening
    exchange — the entire corpus got shingled twice, once of that
    single-threaded (measured 10x the query cost). The outer variant
    infers nothing; empty/null shingle sets become one null row,
    dropped by a filter on the GENERATED column (which can never sink
    below the Generate)."""
    return (
        _shingle_set_table(df, text_col, id_col, n)
        .select(id_col, F.explode_outer("_sh").alias("_sk"))
        .filter(F.col("_sk").isNotNull())
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 20,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via posting lists.

    ``max_df`` drops shingles appearing in more than that many docs
    (they contribute candidate-pair blowup but little similarity
    signal). Returns (id_1, id_2, jaccard) with id_1 < id_2.

    Shape: ONE aggregation per shingle key builds the posting list;
    pair candidates are generated by expanding each (≤ max_df-sized)
    sorted list with array HOFs — no self-join, no persists, and the
    single groupBy-shingle exchange is shared by the pair branch and
    the size branch via Spark's ReusedExchange, so the whole operator
    is one job over one scan. Work is Σ df(s)² bounded by max_df·|sh|,
    same as the inverted-index self-join, minus one full shuffle of the
    posting stream and two materialization barriers. Transient executor
    memory holds one posting list per shingle (≤ max_df ids after the
    cap; a pre-cap hot shingle's list is collected then dropped —
    max observed df × 8 bytes, salting the groupBy if a single key
    could exceed executor memory). Collision odds ~(N²/2⁶⁴) on the
    8-byte keys are negligible against the 4dp-rounded Jaccard."""
    sh = _distinct_shingles(df, text_col, id_col, n)
    posts = sh.groupBy("_sk").agg(F.sort_array(F.collect_list(id_col)).alias("_ids"))
    if max_df is not None:
        posts = posts.filter(F.size("_ids") <= max_df)
    # collect_list is flagged non-deterministic, which blocks exchange
    # reuse — without the persist the scan+group subtree would run once
    # per consumer branch. One eager materialization of the (small,
    # capped) posting table; caller/bench clearCache() releases it.
    posts = posts.persist()
    posts.count()
    sizes = (
        posts.select(F.explode("_ids").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pair_expr = F.expr(
        "flatten(transform(_ids, (x, i) -> "
        "transform(slice(_ids, i + 2, size(_ids)), y -> struct(x AS id_1, y AS id_2))))"
    )
    # explode_outer + null filter: inner explode would re-inline the
    # pair-expansion HOF into an inferred pre-Generate filter,
    # doubling the candidate-generation cost (see _distinct_shingles).
    inter = (
        posts.filter(F.size("_ids") >= 2)
        .select(F.explode_outer(pair_expr).alias("_p"))
        .filter(F.col("_p").isNotNull())
        .groupBy(F.col("_p.id_1").alias("id_1"), F.col("_p.id_2").alias("id_2"))
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("id_1"), F.col("_n").alias("_n1"))
    s2 = sizes.select(F.col(id_col).alias("id_2"), F.col("_n").alias("_n2"))
    return (
        inter.join(s1, "id_1")
        .join(s2, "id_2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("_inter") / (F.col("_n1") + F.col("_n2") - F.col("_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT n-gram-Jaccard pairs via prefix filtering (AllPairs/PPJoin
    candidate pruning) — no ``max_df`` recall cap.

    Sort every doc's shingle-hash set by a global (document-frequency
    ASC, hash) order; a pair with Jaccard >= t must share an element
    within each side's first ``|d| - ceil(t*|d|) + 1`` elements
    (J >= t implies overlap >= ceil(t*|d|), and two sets whose prefixes
    are disjoint under a common total order cannot overlap that much).
    Only PREFIX tokens — by construction the RAREST tokens of each doc
    — enter the candidate join, so candidate volume is sum of
    prefix-df² instead of df² over all postings, and no shingle is ever
    dropped: unlike ``ngram_jaccard_pairs(max_df=...)`` the result is
    complete at every threshold. A size filter (t·|A| <= |B| <= |A|/t)
    prunes length-incompatible collisions at the join, and candidates
    are verified with exact set intersection.

    Scale shape: three linear shuffles (df count on 8-byte hash keys,
    df join-back, per-doc regroup) + the prefix equality join — every
    stage keyed, partial-aggregated, skew-bounded by prefix-df which
    the df-ascending order minimizes. 100 TB runs are the documented
    use of this scheme (it is how production exact-dedup avoids both
    the N² cross join and silent hot-shingle drops)."""
    docs = _with_min_words(df, text_col, n)
    # Persist the per-doc set table: the df-count branch and the
    # ordered-regroup branch both consume it (different shuffle shapes,
    # so no ReusedExchange), and it is tiny (id + hashes ≈ 0.5 KB/doc).
    sets = _shingle_set_table(docs, text_col, id_col, n).persist()
    toks = sets.select(id_col, F.explode("_sh").alias("_h"))
    dfreq = toks.groupBy("_h").agg(F.count(F.lit(1)).alias("_df"))
    # Global order = (df ASC, hash): array_sort on the struct gives the
    # canonical per-doc ordering.
    ordered = (
        toks.join(dfreq, "_h")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_df", "_h"))).alias("_o"))
    )
    # Single-phase PPJoin: the prefix rows CARRY the full (df-ordered)
    # hash set, so each candidate match scores exactly in place — no
    # second verification pass re-deriving participant sets (a separate
    # verify phase was measured ~4x slower end-to-end: three more
    # joins + two broadcast barriers). The payload cost is one set copy
    # per prefix token; the two-phase variant is the fallback if
    # documents are huge and candidates few.
    full = F.transform(F.col("_o"), lambda s: s["_h"])
    nn = F.size("_o")
    # Exact integer ceilings: double-precision ceil(n*t) can round a
    # hair ABOVE an exactly-integer product (shrinking the prefix /
    # inflating alpha and silently dropping true pairs). Treat the
    # threshold as the rational the caller wrote (0.5 -> 1/2) and
    # compute ceil(x*a/b) = (x*a + b - 1) div b in exact long math.
    ta, tb = (
        Fraction(threshold).limit_denominator(1_000_000).as_integer_ratio()
    )

    def ceil_frac(x, a: int, b: int):
        num = x.cast("long") * F.lit(a) + F.lit(b - 1)
        return ((num - num % F.lit(b)) / F.lit(b)).cast("long")

    plen = (nn - ceil_frac(nn, ta, tb) + 1).cast("int")
    # posexplode_outer + null filter: the inner variant's inferred
    # pre-Generate filter would inline the prefix slice/transform twice
    # (see _distinct_shingles).
    pre = ordered.select(
        id_col,
        nn.alias("_n"),
        full.alias("_s"),
        F.posexplode_outer(F.slice(full, F.lit(1), plen)).alias("_p", "_h"),
    ).filter(F.col("_p").isNotNull())
    a = pre.select(
        F.col(id_col).alias("id_1"), F.col("_n").alias("_n1"),
        F.col("_s").alias("_a"), F.col("_p").alias("_p1"), "_h",
    )
    b = pre.select(
        F.col(id_col).alias("id_2"), F.col("_n").alias("_n2"),
        F.col("_s").alias("_b"), F.col("_p").alias("_p2"), "_h",
    )
    t = F.lit(threshold)
    # PPJoin positional filter: a match at (0-based) positions p1/p2
    # bounds the overlap by 1 + min(n1-p1-1, n2-p2-1); pairs that
    # cannot reach the required overlap ceil(t/(1+t)·(n1+n2)) are
    # pruned BEFORE the set intersection — cheap integer math killing
    # most late-position random collisions.
    # alpha = ceil(t/(1+t) * (n1+n2)) = ceil(a*(n1+n2) / (a+b)),
    # computed in exact integer arithmetic like the prefix length.
    alpha = ceil_frac(F.col("_n1") + F.col("_n2"), ta, ta + tb)
    ubound = 1 + F.least(
        F.col("_n1") - F.col("_p1") - 1, F.col("_n2") - F.col("_p2") - 1
    )
    inter = F.size(F.array_intersect(F.col("_a"), F.col("_b")))
    return (
        a.join(b, "_h")
        .filter(
            (F.col("id_1") < F.col("id_2"))
            & (F.col("_n1") >= t * F.col("_n2"))
            & (F.col("_n2") >= t * F.col("_n1"))
            & (ubound >= alpha)
        )
        .withColumn(
            "jaccard",
            F.round(inter / (F.col("_n1") + F.col("_n2") - inter), 4),
        )
        .filter(F.col("jaccard") >= t)
        .select("id_1", "id_2", "jaccard")
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """k MinHash values per doc, computed PER ROW (no explode, no
    shuffle): fold the distinct-shingle-hash array with an elementwise
    ``least``. Output: (id, sig array<long>[k]). A narrow map stage —
    signatures for a 100 TB corpus run at scan speed with zero exchange.

    Per-seed re-hash is ``xxhash64(seed, h)`` — one JVM hash call per
    (shingle, seed). Measured faster than the Kirsch-Mitzenmacher
    h1+i*h2 double-hashing here: under ANSI SQL the multiply/add pay
    overflow checks that cost more than xxhash's mixing.

    ``shingles``: an already-built (id, _sh) shingle-set table for
    exactly ``df`` (typically persisted by a caller that ALSO needs it
    for exact verification) — the fold then reads the cached arrays
    instead of re-shingling the corpus text (audit-reuse: the shingle
    pass is the corpus-linear cost)."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.aggregate(
        F.col("_sh"),
        F.array_repeat(F.lit(_LONG_MAX), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(seeds, lambda i: F.xxhash64(i, h)),
            lambda a, b: F.least(a, b),
        ),
    )
    base = (
        shingles
        if shingles is not None
        else _shingle_set_table(df, text_col, id_col, n)
    )
    return base.select(id_col, sig.alias("sig"))


def banded_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(id, band, band_hash) LSH keys: MinHash signature folded per row,
    then one band hash per ``bands`` slice — a narrow map ×bands
    explode, no shuffle. This IS the persistable dedup index row.
    ``shingles``: see minhash_signatures (shared shingle-set reuse)."""
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, shingles=shingles)
    return sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(*[F.col("sig")[b * r + j] for j in range(r)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )


def verify_pairs_exact(
    docs: DataFrame,
    cand: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact-Jaccard verification of candidate (id_1, id_2) pairs:
    semi-join ``docs`` down to pair participants, build per-doc
    shingle-hash SETS once, score each pair with one array_intersect —
    O(candidates · doclen), independent of corpus size.

    ``cand`` is deliberately NOT persisted here: its DAG re-executes
    (ids derivation + the final join), but the expensive subtree — the
    signature table the band self-join reads — is already cached by the
    callers, so each re-execution is a cheap join of cached data.
    Persisting cand was A/B-measured 2-5x SLOWER end-to-end (the extra
    materialization barrier + caching an AQE subplan cost far more than
    the re-joins). A caller that needs candidates durable (continuous
    dedup) materializes them as a TABLE instead — see
    ``minhash_index_build``.

    ``sets`` injects an already-persisted participant shingle-set table
    ``(id, _sh)`` so a caller running BOTH the operator and an audit
    pass over it pays the set build once (the audit-reuse pattern,
    VERDICT r3 #9); when None it is built here from ``docs``."""
    if sets is None:
        ids = (
            cand.select(F.col("id_1").alias(id_col))
            .union(cand.select(F.col("id_2").alias(id_col)))
            .distinct()
        )
        sets = _shingle_set_table(
            docs.join(ids, id_col, "left_semi"), text_col, id_col, n
        ).persist()
        sets.count()  # materialize before the two broadcast builds below
    inter = F.size(F.array_intersect(F.col("_a"), F.col("_b")))
    union = F.size(F.col("_a")) + F.size(F.col("_b")) - inter
    return (
        cand.join(
            F.broadcast(sets.select(F.col(id_col).alias("id_1"), F.col("_sh").alias("_a"))),
            "id_1",
        )
        .join(
            F.broadcast(sets.select(F.col(id_col).alias("id_2"), F.col("_sh").alias("_b"))),
            "id_2",
        )
        .withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
    banded: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, optionally verified
    with exact Jaccard (no max_df cap — verification only runs on the
    candidate set, which banding already made near-linear).

    With k=32, b=16, r=2: P(candidate | J=0.5) ≈ 1-(1-0.5²)^16 ≈ 0.99,
    still ~0.48 at J=0.2 — the extra low-J candidates are cheap because
    only the verify join sees them, and it is linear in candidates.
    (r=4/k=64 had ~0.65 recall at J=0.5 — banding width, not hash
    count, is the recall lever.)

    ``banded``: precomputed, MATERIALIZED (id, band, band_hash) keys
    for exactly ``df`` under the same (n, num_hashes, bands) — the
    signature-reuse path the parity audits take so build/delta/rebuild
    legs sign the corpus once (signatures are row-local, so a filtered
    shared table is bit-identical to a per-leg recompute).
    """
    df = _with_min_words(df, text_col, n)
    if banded is None:
        # Persist + eager count: the banding self-join reads the
        # signature table twice, and AQE launches both join-side stages
        # concurrently — against a lazily-persisted table the two
        # stages RACE to compute the uncached fold (each task pair
        # duplicates the work). One count materializes the cache before
        # fan-out. Signatures are tiny (id + k longs ≈ 0.3 KB/doc).
        banded = banded_signatures(
            df, text_col, id_col, n, num_hashes, bands
        ).persist()
        banded.count()
    a = banded.select(F.col(id_col).alias("id_1"), "band", "band_hash")
    b_ = banded.select(F.col(id_col).alias("id_2"), "band", "band_hash")
    cand = (
        a.join(b_, ["band", "band_hash"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .distinct()
    )
    if not verify:
        return cand
    return verify_pairs_exact(df, cand, text_col, id_col, n, threshold)


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: hash each distinct shingle, vote ±1 per
    bit position, sign of the vote sets the bit. Computed PER ROW
    (fold over the shingle-hash array with an elementwise vote update)
    — zero shuffles, vs. the naive explode + 64-column groupBy whose
    codegen collapses. (Shingles, not tokens: on a shared-vocabulary
    corpus the distinct-token set is near-identical across docs and
    SimHash would saturate; 3-gram shingles keep it discriminative.)"""
    # SWAR bit-counting: 16 packed counters, each holding 4 × 16-bit
    # lanes (bits j, j+16, j+32, j+48 live in counter j), so each
    # shingle costs 16 shift/mask/adds instead of 64 branch votes.
    # Lane width 16 ⇒ correct up to 65,535 distinct shingles per doc.
    # Both the fold and the unpack are COMPACT runtime-loop expressions
    # (transform/aggregate over sequence literals), not Python-unrolled
    # 16/64-wide trees: the unrolled form built a 64-deep when-chain
    # that Catalyst re-analyzed on every run — ~1 s of driver plan time
    # per execution for a row-local map (the r8 JIT-warmup-frontier
    # finding; runtime loop bodies JIT once and stay hot).
    assert bits == 64, "SWAR packing is specialized to 64-bit signatures"
    base = _shingle_set_table(df, text_col, id_col, 3)
    # lane mask 0x0001000100010001 = 281479271743489
    counters = F.expr(
        "aggregate(_sh, array_repeat(0L, 16), (acc, h) -> zip_with(acc, "
        "transform(sequence(0, 15), j -> shiftrightunsigned(h, j) & "
        "281479271743489L), (a, b) -> a + b))"
    )
    packed = base.select(id_col, counters.alias("_cnt"), F.size("_sh").alias("_n"))
    # Bit i set ⟺ ones-count > half the shingles (vote sum positive).
    # Sum of disjoint bit values == bitwise OR; shiftleft(1L, 63) is
    # -(2**63) under Java shift semantics — no special case needed.
    sig = F.expr(
        "aggregate(sequence(0, 63), 0L, (acc, i) -> acc + IF("
        "(shiftrightunsigned(_cnt[i % 16], 16 * (i DIV 16)) & 65535) * 2 > _n, "
        "shiftleft(1L, i), 0L))"
    )
    return packed.select(id_col, sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 6,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Pairs within hamming distance ``max_hamming`` of 64-bit SimHash.

    Multi-table pigeonhole banding (the Manku/WWW'07 scheme): split the
    64 bits into ``blocks`` blocks; if two signatures differ in at most
    ``d = max_hamming`` bits, those bits touch at most ``d`` blocks, so
    SOME combination of ``blocks - d`` blocks is bit-identical. Each
    doc therefore gets C(blocks, blocks-d) keys — xxhash64 of one block
    combination each — and near-dup discovery is an equality join on
    (table, key), verified exactly with bit_count(xor).

    Key width is the point: with the old 4 × 16-bit chunk join, random
    collisions grow as N²·4/2¹⁷ — quadratic blowup that forced a corpus
    cap. With b=6, d=3 the effective key is 64·(b-d)/b = 32 bits across
    C(6,3)=20 tables: N²·20/2³³ expected false candidates, ~3000× fewer,
    so the uncapped full-corpus query stays near-linear (only genuinely
    close pairs collide; the 20× key explode is a narrow map).

    Signatures persisted + eagerly materialized: the key self-join
    reads them twice (8 bytes per doc — negligible at any scale).
    ``signatures`` injects an already-persisted ``(id, simhash)`` table
    (audit-reuse pattern — the caller shares it with a verification
    pass); when None it is computed here."""
    from itertools import combinations

    d = max_hamming
    assert 1 <= blocks - d, "need at least one untouched block (blocks > max_hamming)"
    if signatures is None:
        df = _with_min_words(df, text_col, 3)
        sig = simhash_signatures(df, text_col, id_col).persist()
        sig.count()
    else:
        sig = signatures
    sizes = [64 // blocks + (1 if i < 64 % blocks else 0) for i in range(blocks)]
    offs = [sum(sizes[:i]) for i in range(blocks)]

    def block_val(i: int) -> Column:
        return F.shiftrightunsigned(F.col("simhash"), offs[i]).bitwiseAND(
            F.lit((1 << sizes[i]) - 1)
        )

    combos = list(combinations(range(blocks), blocks - d))
    keyed = sig.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(*[F.xxhash64(*[block_val(i) for i in combo]) for combo in combos])
        ).alias("tbl", "key"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_1"), F.col("simhash").alias("_s1"), "tbl", "key"
    )
    b = keyed.select(
        F.col(id_col).alias("id_2"), F.col("simhash").alias("_s2"), "tbl", "key"
    )
    return (
        a.join(b, ["tbl", "key"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def minhash_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    banded: DataFrame | None = None,
) -> str:
    """Materialize the LSH dedup index: the (id, band, band_hash) key
    stream as parquet. At 100 TB this is the amortized artifact that
    makes CONTINUOUS dedup cheap — each ingestion batch joins its own
    keys against the index instead of re-signing the whole corpus.
    ``banded``: precomputed keys for ``df`` (see minhash_lsh_pairs)."""
    if banded is None:
        banded = banded_signatures(
            _with_min_words(df, text_col, n), text_col, id_col, n, num_hashes, bands
        )
    banded.write.mode("overwrite").parquet(path)
    return path


def minhash_lsh_incremental(
    new_docs: DataFrame,
    base_docs: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    threshold: float = 0.5,
    append: bool = True,
    banded_new: DataFrame | None = None,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: all verified pairs INVOLVING the new batch
    — new×index candidates plus new×new — without touching the signed
    corpus (``base_docs`` is read only for the few pair PARTICIPANTS'
    exact verification). With ``append``, the batch's keys join the
    index afterwards, keeping it current for the next batch.

    Batch parity (audited by ``minhash_incremental_invariant``):
    pairs(base ∪ new) = pairs(base) ∪ incremental(new | index(base)) —
    same signatures, same banding, same verification, split by which
    side of the batch boundary each pair straddles.

    ``banded_new``: precomputed, MATERIALIZED keys for ``new_docs``
    (see minhash_lsh_pairs). ``sets``: an already-persisted
    ``(id, _sh)`` shingle-set table covering the pair participants
    (see verify_pairs_exact) — a caller verifying several legs over
    the same corpus builds the sets once instead of per leg."""
    spark = new_docs.sparkSession
    new_docs = _with_min_words(new_docs, text_col, n)
    if banded_new is None:
        nb = banded_signatures(
            new_docs, text_col, id_col, n, num_hashes, bands
        ).persist()
        nb.count()
    else:
        nb = banded_new
    idx = spark.read.parquet(index_path)
    a = nb.select(F.col(id_col).alias("id_1"), "band", "band_hash")
    cross = (
        a.join(idx.select(F.col(id_col).alias("id_2"), "band", "band_hash"),
               ["band", "band_hash"])
        .filter(F.col("id_1") != F.col("id_2"))
        .select(F.least("id_1", "id_2").alias("id_1"),
                F.greatest("id_1", "id_2").alias("id_2"))
    )
    within = (
        a.join(nb.select(F.col(id_col).alias("id_2"), "band", "band_hash"),
               ["band", "band_hash"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
    )
    cand = cross.union(within).distinct()
    docs = base_docs.select(id_col, text_col).unionByName(
        new_docs.select(id_col, text_col)
    )
    out = verify_pairs_exact(docs, cand, text_col, id_col, n, threshold, sets=sets)
    if append:
        out = out.localCheckpoint(eager=True)  # materialize before the index grows
        nb.write.mode("append").parquet(index_path)
    return out
