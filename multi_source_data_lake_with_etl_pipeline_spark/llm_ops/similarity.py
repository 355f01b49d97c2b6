"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k against a query vector —
  one narrow scan, per-partition top-k then global top-k (Spark's
  ``orderBy().limit()`` already executes as TakeOrdered: no full sort,
  no shuffle of the data, only k rows per partition move).
- ``similar_pairs``: exact all-pairs over a (sampled/blocked) set.
- ``hyperplane_lsh_buckets`` / ``ann_lsh``: random-hyperplane signature
  → equality-join buckets — the linear-cost approximate path.
- ``ann_ivf``: inverted-file search — coarse centroids, partition
  pruning via top-``nprobe`` centroid assignment. The 100 TB shape:
  the centroid assignment is a broadcast map-side op; only probed
  partitions are scanned.

Dot products use ``F.zip_with`` + ``F.aggregate`` (JVM-side, no UDF).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vec: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity (id tiebreak)."""
    q = _lit_vec(query_vec)
    return (
        df.select(id_col, F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def similar_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold (id_1 < id_2). Quadratic —
    use on a blocked/sampled set; ``ann_lsh`` is the scale path."""
    a = df.select(F.col(id_col).alias("id_1"), F.col(vec_col).alias("_v1"))
    b = df.select(F.col(id_col).alias("id_2"), F.col(vec_col).alias("_v2"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            F.round(cosine(F.col("_v1"), F.col("_v2")), 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (numpy, fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Sign-bit signature: bit i = 1 iff vec · plane_i > 0 (JVM HOF
    variant — one fold per plane; fine for a handful of planes)."""
    bits = [
        F.when(dot(vec, _lit_vec(p)) > 0, F.lit(1)).otherwise(F.lit(0)) for p in planes
    ]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + b.cast("long") * F.lit(2**i).cast("long")
    return sig


def hyperplane_signatures_arrow(
    vec_col: str, plane_sets: list[list[list[float]]]
) -> Column:
    """ALL table signatures in one Arrow-batched matmul:
    ``array<long>`` of length ``len(plane_sets)``.

    The JVM HOF variant materializes one zipped array + fold PER
    PLANE per row — T·P array allocations for T tables of P planes.
    Here every batch does a single (N, dim) @ (dim, T·P) float64
    matmul (the documented UDF exception: vectorized math that
    built-ins can only express as per-plane folds). Still a narrow
    map — no shuffle, scan-speed at any corpus size — and the same
    float64 arithmetic as the driver-side query-vector signature, so
    row/query bit decisions can't diverge on borderline dots."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n_tables = len(plane_sets)
    n_planes = len(plane_sets[0])
    W = np.concatenate(
        [np.array(p, dtype="float64").T for p in plane_sets], axis=1
    )  # (dim, T*P)
    weights = (1 << np.arange(n_planes)).astype("int64")

    @pandas_udf("array<long>")
    def _sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.vstack(v.to_numpy()).astype("float64")
        bits = (m @ W) > 0
        sigs = np.empty((m.shape[0], n_tables), dtype="int64")
        for t in range(n_tables):
            sigs[:, t] = bits[:, t * n_planes : (t + 1) * n_planes] @ weights
        return pd.Series(list(sigs))

    return _sigs(F.col(vec_col))


def ann_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: only rows in the query's hyperplane bucket
    are scored. Recall < 1 by construction (bucket may exclude true
    neighbors); multiply tables (seeds) to raise recall."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    import numpy as np

    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(np.array(query_vec), np.array(p))) > 0:
            qsig += 2**i
    q = _lit_vec(query_vec)
    return (
        df.withColumn(
            "_sig",
            F.element_at(hyperplane_signatures_arrow(vec_col, [planes]), 1),
        )
        .filter(F.col("_sig") == qsig)
        .select(id_col, F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).
    Centroid list is broadcast as literals — a map-side narrow op.

    Argmax via array_position over an array of similarities: N
    independent expressions, not an iterated when-chain (which would
    nest the running best into every branch — exponential tree)."""
    sims = F.array(*[cosine(F.col(vec_col), _lit_vec(c)) for _, c in centroids])
    ids = F.array(*[F.lit(cid) for cid, _ in centroids])
    pos = F.array_position(sims, F.array_max(sims)).cast("int")
    return df.withColumn("_centroid", F.element_at(ids, pos))


def ivf_assign_arrow(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    with_sim: bool = False,
) -> DataFrame:
    """Vectorized centroid assignment: one numpy matmul per Arrow
    batch instead of k per-row HOF cosine folds.

    Spark's array HOFs (zip_with/aggregate) evaluate their lambdas
    OUTSIDE whole-stage codegen — measured ~1 s per assignment job for
    k=8, d=64 regardless of row count, all interpreter overhead. The
    Arrow batch path is the dense-linear-algebra shape: normalize the
    k×d centroid matrix once on the driver, then each batch is a
    single (n×d)·(d×k) product + argmax. First-max tie-breaking
    matches the JVM variant; float sums differ at ~1e-16 (summation
    order), far below any real centroid separation.
    """
    import numpy as np
    import pandas as pd

    C = np.asarray([c for _, c in centroids], dtype=np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
    ids = np.asarray([cid for cid, _ in centroids], dtype=np.int32)

    @F.pandas_udf("struct<c:int,s:double>")
    def _assign(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"c": pd.Series([], dtype="int32"),
                                 "s": pd.Series([], dtype="float64")})
        m = np.asarray(v.tolist(), dtype=np.float64)
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ Cn.T
        best = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {"c": ids[best], "s": sims[np.arange(len(best)), best]}
        )

    out = df.withColumn("_a", _assign(F.col(vec_col)))
    out = out.withColumn("_centroid", F.col("_a.c"))
    if with_sim:
        out = out.withColumn("_centroid_sim", F.col("_a.s"))
    return out.drop("_a")


def ann_ivf(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF search: score only vectors assigned to the ``nprobe``
    centroids nearest the query. At scale the assignment is written
    once (partitionBy _centroid) and probing = partition pruning."""
    import numpy as np

    qv = np.array(query_vec, dtype="float64")

    def cos_np(c):
        c = np.array(c, dtype="float64")
        return float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c) + 1e-12))

    probe_ids = [
        cid for cid, _ in sorted(centroids, key=lambda t: -cos_np(t[1]))[:nprobe]
    ]
    q = _lit_vec(query_vec)
    # Arrow assignment (see ivf_assign_arrow): scoring stays JVM-side
    # so emitted cos_sim values are bit-identical with the exact/brute
    # paths — probing only changes WHICH rows are scored.
    return (
        ivf_assign_arrow(df, centroids, vec_col)
        .filter(F.col("_centroid").isin(probe_ids))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_build(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
    vec_col: str = "embedding",
) -> str:
    """Materialize the IVF index: assignments written
    ``partitionBy(_centroid)``, so each centroid's posting list is its
    own partition directory. At 100 TB this is the amortized one-time
    build; every search afterward reads only ``nprobe`` partitions
    (static partition pruning — no scan of the other lists)."""
    ivf_assign_arrow(df, centroids, vec_col).write.partitionBy("_centroid").mode(
        "overwrite"
    ).parquet(path)
    return path


def ann_ivf_probe(
    spark,
    index_path: str,
    query_vec: Sequence[float],
    centroids: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search a built IVF index: rank centroids driver-side (tiny),
    read ONLY the nprobe matching partitions, brute-force within."""
    import numpy as np

    qv = np.array(query_vec, dtype="float64")

    def cos_np(c):
        c = np.array(c, dtype="float64")
        return float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c) + 1e-12))

    probe_ids = [
        cid for cid, _ in sorted(centroids, key=lambda t: -cos_np(t[1]))[:nprobe]
    ]
    q = _lit_vec(query_vec)
    return (
        spark.read.parquet(index_path)
        .filter(F.col("_centroid").isin(probe_ids))
        .select(id_col, F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def ann_lsh_multitable(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Multi-table hyperplane LSH: union the query's bucket across
    ``n_tables`` independently-seeded plane sets, dedup, score once.

    Recall rises as 1-(1-p)^T for per-table hit probability p, while
    cost stays ~T small bucket scans — the standard recall lever when
    a single table's bucket misses near neighbors. All signatures
    compute in ONE narrow pass (T sig columns side by side), so the
    corpus is still scanned exactly once."""
    import numpy as np

    dim = dim or len(query_vec)
    qv = np.array(query_vec, dtype="float64")
    plane_sets = []
    qsigs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + t)
        qsig = 0
        for i, p in enumerate(planes):
            if float(qv @ np.array(p)) > 0:
                qsig += 2**i
        plane_sets.append(planes)
        qsigs.append(qsig)
    sigs = hyperplane_signatures_arrow(vec_col, plane_sets)
    hit = F.lit(False)
    for t, qsig in enumerate(qsigs):
        hit = hit | (F.element_at(F.col("_sigs"), t + 1) == F.lit(qsig))
    q = _lit_vec(query_vec)
    return (
        df.select(id_col, vec_col, sigs.alias("_sigs"))
        .filter(hit)
        .select(id_col, F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def blocked_neardup_pairs(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-shaped blocked pairwise cosine: all pairs WITHIN a
    block (coarse cluster id, shard, language...), never across.

    The block key turns the quadratic all-pairs into Σ|block|² work
    and an equality join Catalyst executes as a hash join on the block
    key — the standard way semantic dedup scales: cluster first
    (``kmeans``), then pairwise only inside clusters. Threshold is
    applied to the UNROUNDED cosine (round is output formatting only),
    so an external engine reproduces the pair set exactly.
    """
    from .dedup import widen

    # Widen the probe side: the per-pair cosine runs where the join
    # output lives, and a broadcast join inherits the probe scan's
    # splits — a small single-file table would pin Σblock² cosine
    # work to one core (no-op when the scan is already wide).
    a = widen(
        df.select(
            F.col(block_col).alias("_blk"),
            F.col(id_col).alias("id_1"),
            F.col(vec_col).alias("_v1"),
        )
    )
    b = df.select(
        F.col(block_col).alias("_blk"),
        F.col(id_col).alias("id_2"),
        F.col(vec_col).alias("_v2"),
    )
    cs = cosine(F.col("_v1"), F.col("_v2"))
    return (
        a.join(b, "_blk")
        .filter((F.col("id_1") < F.col("id_2")) & (cs >= threshold))
        .select("id_1", "id_2", F.round(cs, 4).alias("cos_sim"))
    )


def semantic_dedup(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Drop every vector that has a LOWER-id neighbor with cosine ≥
    threshold in its block (the SemDeDup keep-one-per-near-dup-set
    rule with min-id as the canonical survivor).

    Survivor-set semantics (chain-safe): a row is dropped iff a
    smaller-id near neighbor exists — so of {1,2,3} pairwise-similar,
    only 1 survives; of a chain 1~2, 2~3 (1!~3), {1,3} survive. The
    drop set is the distinct id_2 side of the pair table — usually far
    smaller than the corpus, but on heavily-duplicated corpora it is
    O(corpus), so the anti-join is NOT force-broadcast: the planner
    broadcasts it while it fits and shuffles on the 8-byte id past
    that (the correct degradation).
    """
    losers = (
        blocked_neardup_pairs(df, block_col, threshold, vec_col, id_col)
        .select(F.col("id_2").alias(id_col))
        .distinct()
    )
    return df.join(losers, id_col, "left_anti")


def kmeans(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[list[tuple[int, list[float]]], DataFrame]:
    """Spherical k-means (Lloyd's): returns (centroids, df + ``_centroid``).

    The clustering pass that feeds IVF indexing and SemDeDup blocking.
    Fully deterministic: init = the k vectors with smallest
    ``(md5(id), id)`` (an unbiased engine-independent hash sample);
    assignment = max-cosine (``ivf_assign``, scale-invariant so mean
    centroids need no renormalization); ties break to the first
    centroid.

    Scale shape per iteration: centroids broadcast as literals (k×dim
    doubles on the driver — the standard Lloyd's pattern, same as
    Spark MLlib KMeans); assignment is a narrow map; the centroid
    update is ONE shuffle of (cluster, dim_pos, value) with map-side
    partial aggregation, k×dim rows collected. Driver state stays
    k×dim floats regardless of corpus size.
    """
    from .dedup import widen

    # Iterative input: widen (assignment is a narrow argmax map — a
    # 1-split scan would run it on one core) and persist (every Lloyd
    # iteration re-reads the vectors; without the cache each iteration
    # re-scans the source — MLlib caches its input the same way).
    base = widen(df).persist()
    init = (
        base.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(init)]
    # Arrow assignment: per-batch matmul, not per-row HOF folds — see
    # ivf_assign_arrow (the JVM variant's interpreted lambdas dominate
    # iteration cost even on tiny inputs).
    for _ in range(iters):
        assigned = ivf_assign_arrow(base, centroids, vec_col)
        means = (
            assigned.select("_centroid", F.posexplode(F.col(vec_col)).alias("_p", "_x"))
            .groupBy("_centroid", "_p")
            .agg(F.avg("_x").alias("_m"))
            .collect()
        )
        by_c: dict[int, dict[int, float]] = {}
        for r in means:
            by_c.setdefault(r["_centroid"], {})[r["_p"]] = float(r["_m"])
        # empty clusters keep their previous centroid
        centroids = [
            (cid, [by_c[cid][p] for p in range(len(by_c[cid]))] if cid in by_c else vec)
            for cid, vec in centroids
        ]
    # Materialize the final assignment before dropping the cache —
    # returning a lazy plan over an unpersisted base would recompute
    # the whole widen+scan on first use. (At scale you'd write the
    # assignment to the lake here; localCheckpoint is its local-mode
    # equivalent and keeps the library free of leaked persists.)
    out = ivf_assign_arrow(base, centroids, vec_col).localCheckpoint(eager=True)
    base.unpersist()
    return centroids, out


# ----------------------------------------------------------- product
# quantization (PQ): compress embeddings to m byte-ish codes and score
# with asymmetric distance (ADC) — the standard IVF companion that
# makes billion-vector ANN fit in memory (codes are m small ints vs
# dim floats; a 64-d float vector becomes 8 codes ≈ 16x smaller).


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Train PQ codebooks: split each vector into ``m`` equal subspaces
    and k-means each subspace with L2 Lloyd's — ALL subspaces trained
    in the same jobs (one Arrow assignment pass + one posexplode
    shuffle per iteration, not m separate clusterings). Deterministic:
    init per subspace = sub-vectors of the k smallest-(md5(id), id)
    rows, ties to the lowest code. Returns codebooks[sub][code] =
    centroid (dim/m floats); driver state is m*k*(dim/m) = k*dim
    floats, independent of corpus size."""
    import numpy as np

    from .dedup import widen

    base = widen(df).persist()
    init_rows = (
        base.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    dim = len(init_rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    books = np.array(
        [[[float(x) for x in r[vec_col][s * ds : (s + 1) * ds]] for r in init_rows]
         for s in range(m)]
    )  # (m, k, ds)
    for _ in range(iters):
        coded = pq_encode(base, books.tolist(), vec_col, id_col, _keep_vec=True)
        means = (
            coded.select(
                F.posexplode(F.col(vec_col)).alias("_p", "_x"), "pq_code"
            )
            .select(
                (F.col("_p") / ds).cast("int").alias("_sub"),
                F.pmod(F.col("_p"), F.lit(ds)).alias("_pos"),
                F.element_at(F.col("pq_code"), (F.col("_p") / ds).cast("int") + 1).alias("_code"),
                "_x",
            )
            .groupBy("_sub", "_code", "_pos")
            .agg(F.avg("_x").alias("_mean"))
            .collect()
        )
        for r in means:  # empty codes keep their previous centroid
            books[r["_sub"], r["_code"], r["_pos"]] = float(r["_mean"])
    base.unpersist()
    return books.tolist()


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    _keep_vec: bool = False,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Encode vectors to ``pq_code`` array<int> (length m): per
    subspace, the L2-nearest codebook entry. Arrow-batched matmul per
    subspace (argmin of ||x-c||² = argmin(c·c - 2 x·c)); the codebooks
    ride to executors as a broadcast-closure ndarray. Narrow map — at
    scale this runs at scan speed, and the encoded table is what you
    persist (16x smaller than the raw vectors)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = np.asarray(codebooks)  # (m, k, ds)
    m, _, ds = books.shape
    sq = (books**2).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        X = np.asarray(v.tolist(), dtype=np.float64)  # (n, dim)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for s in range(m):
            xs = X[:, s * ds : (s + 1) * ds]  # (n, ds)
            d2 = sq[s][None, :] - 2.0 * (xs @ books[s].T)  # (n, k)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    cols = [id_col, vec_col] if _keep_vec else [id_col]
    cols += extra_cols or []
    return df.select(*cols, _enc(F.col(vec_col)).alias("pq_code"))


def pq_adc_lut(codebooks: list[list[list[float]]], query: Sequence[float]) -> list[list[float]]:
    """ADC lookup table: lut[sub][code] = ||q_sub - centroid||²."""
    import numpy as np

    books = np.asarray(codebooks)
    m, _, ds = books.shape
    q = np.asarray(query, dtype=np.float64)
    return [
        ((books[s] - q[s * ds : (s + 1) * ds][None, :]) ** 2).sum(axis=1).tolist()
        for s in range(m)
    ]


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: Sequence[float],
    topk: int = 10,
    id_col: str = "vec_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Approximate nearest neighbours by asymmetric distance: the query
    stays a float vector, database rows are PQ codes, distance = sum of
    m LUT lookups — pure JVM expression over a literal LUT (no UDF in
    the scoring scan), then TakeOrdered. The scan reads only the code
    column: at 100 TB this touches the 16x-compressed representation.
    Returns (id, pq_dist) ascending. ``keep_cols``: extra columns of
    ``encoded`` carried through to the result (e.g. ``pq_code`` so an
    auditor can recompute the distance from the SAME row in one pass
    instead of re-joining the encoded table)."""
    lut = pq_adc_lut(codebooks, query)
    m = len(lut)
    flat = [float(x) for sub in lut for x in sub]  # row-major (m, k)
    k = len(lut[0])
    lut_col = F.array(*[F.lit(v) for v in flat])
    idx = F.sequence(F.lit(0), F.lit(m - 1))
    dist = F.aggregate(
        idx,
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            lut_col, (s * k + F.element_at(F.col("pq_code"), s + 1) + 1).cast("int")
        ),
    )
    return (
        encoded.select(
            id_col, F.round(dist, 6).alias("pq_dist"), *(keep_cols or [])
        )
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(topk)
    )


# ----------------------------------------------------------- scalar
# quantization (SQ8): per-dimension min/max affine quantization to
# 8-bit codes — the FAISS-style SQ companion to PQ: 4x smaller than
# float32 with near-lossless recall, and (unlike PQ) no codebook
# training pass. Part of the beyond-reference LLM-ops layer: the
# compressed embedding representation a 100 TB lake keeps hot while
# the float vectors stay cold.


def sq8_bounds(
    df: DataFrame, vec_col: str = "embedding"
) -> list[tuple[float, float]]:
    """Per-dimension (lo, hi) over the corpus — ONE posexplode +
    groupBy(dim) aggregation (dim keys, map-side partial combine:
    scan-speed at any corpus size), collected driver-side (dim pairs
    of floats — bounded state like centroid lists)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("_d", "_x"))
        .groupBy("_d")
        .agg(F.min("_x").alias("_lo"), F.max("_x").alias("_hi"))
        .collect()
    )
    by_d = {r["_d"]: (float(r["_lo"]), float(r["_hi"])) for r in rows}
    return [by_d[d] for d in range(len(by_d))]


def _sq8_scale(lo: float, hi: float) -> float:
    return 255.0 / (hi - lo) if hi > lo else 0.0


def sq8_encode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    vec_col: str = "embedding",
    out_col: str = "sq_code",
) -> DataFrame:
    """Affine-quantize each vector to ``array<int>`` codes:
    ``clamp(floor((x - lo_d) * scale_d), 0, 255)`` with
    ``scale_d = 255 / (hi_d - lo_d)`` (constant-dimension → code 0).
    Deterministic double arithmetic — an engine replaying the same
    expression emits identical codes (floor of identical doubles).
    The bounds ride in as a one-row broadcast frame (the
    ``ivf_corpus_assign`` pattern): plan size O(1) in dim, no
    per-element py4j literals."""
    dim = len(bounds)
    bdf = df.sparkSession.createDataFrame(
        [([float(lo) for lo, _ in bounds], [_sq8_scale(lo, hi) for lo, hi in bounds])],
        "_sq_los array<double>, _sq_scales array<double>",
    )
    code = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.greatest(
            F.lit(0),
            F.least(
                F.lit(255),
                F.floor(
                    (
                        F.element_at(F.col(vec_col), i).cast("double")
                        - F.element_at(F.col("_sq_los"), i)
                    )
                    * F.element_at(F.col("_sq_scales"), i)
                ).cast("int"),
            ),
        ),
    )
    return (
        df.crossJoin(F.broadcast(bdf))
        .withColumn(out_col, code)
        .drop("_sq_los", "_sq_scales")
    )


def sq8_decode(
    df: DataFrame,
    bounds: list[tuple[float, float]],
    code_col: str = "sq_code",
    out_col: str = "sq_recon",
) -> DataFrame:
    """Reconstruct ``array<double>`` from codes: bin midpoint
    ``lo_d + (code + 0.5) / scale_d`` (``lo_d`` when the dimension is
    constant). Max reconstruction error is half a quantization step
    per dimension."""
    dim = len(bounds)
    bdf = df.sparkSession.createDataFrame(
        [([float(lo) for lo, _ in bounds], [_sq8_scale(lo, hi) for lo, hi in bounds])],
        "_sq_los array<double>, _sq_scales array<double>",
    )
    recon = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda i: F.when(
            F.element_at(F.col("_sq_scales"), i) == 0.0,
            F.element_at(F.col("_sq_los"), i),
        ).otherwise(
            F.element_at(F.col("_sq_los"), i)
            + (F.element_at(F.col(code_col), i).cast("double") + F.lit(0.5))
            / F.element_at(F.col("_sq_scales"), i)
        ),
    )
    return (
        df.crossJoin(F.broadcast(bdf))
        .withColumn(out_col, recon)
        .drop("_sq_los", "_sq_scales")
    )


def ivfpq_build(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Materialize the IVF+PQ index — the canonical billion-vector ANN
    layout: rows carry ONLY (id, pq_code), partitioned by coarse
    centroid. A probe reads nprobe partition dirs (static pruning) of
    the 16x-compressed representation; the float vectors never travel.
    Build = one Arrow assignment pass + one Arrow encode pass, then a
    partitioned write (the amortized one-time cost)."""
    assigned = ivf_assign_arrow(df, centroids, vec_col)
    coded = pq_encode(assigned, codebooks, vec_col, id_col, extra_cols=["_centroid"])
    coded.select(id_col, "pq_code", "_centroid").write.partitionBy("_centroid").mode(
        "overwrite"
    ).parquet(path)
    return path


def ann_ivfpq_probe(
    spark,
    index_path: str,
    query_vec: Sequence[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the IVF+PQ index: rank coarse centroids driver-side,
    read only nprobe partitions, score codes with the ADC lookup-table
    expression (JVM, no UDF), TakeOrdered the top-k. Returns
    (id, pq_dist) ascending — approximate L2 over compressed codes."""
    import numpy as np

    qv = np.array(query_vec, dtype="float64")

    def cos_np(c):
        c = np.array(c, dtype="float64")
        return float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c) + 1e-12))

    probe_ids = [
        cid for cid, _ in sorted(centroids, key=lambda t: -cos_np(t[1]))[:nprobe]
    ]
    lut = pq_adc_lut(codebooks, query_vec)
    m, kk = len(lut), len(lut[0])
    lut_col = F.array(*[F.lit(float(x)) for sub in lut for x in sub])
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            lut_col, (s * kk + F.element_at(F.col("pq_code"), s + 1) + 1).cast("int")
        ),
    )
    return (
        spark.read.parquet(index_path)
        .filter(F.col("_centroid").isin(probe_ids))
        .select(id_col, F.round(dist, 6).alias("pq_dist"))
        .orderBy(F.col("pq_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )



def py_norm(vec: Sequence[float]) -> float:
    """Driver-side L2 norm that is BIT-IDENTICAL to ``norm`` (the JVM
    fold): float64 multiply-adds accumulated left-to-right in index
    order, then IEEE-754 sqrt. Lets constant vectors (centroids,
    query literals) carry their norm as a literal instead of paying a
    per-row ``dot(c, c)`` fold — same emitted doubles, 1/3 the fold
    work."""
    import math

    acc = 0.0
    for x in vec:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def ivf_corpus_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    nprobe: int = 1,
    norm_col: str = "_rn",
) -> DataFrame:
    """EXACT (oracle-replayable) IVF assignment: adds ``_cid`` — the
    row's top-``nprobe`` centroid ids by rounded cosine (4dp, lowest
    cid on ties) — and ``norm_col``, the row's L2 norm, reused by the
    downstream candidate re-rank. nprobe>1 emits one row per probed
    centroid.

    Norm factoring: cosine = dot/(norm_row · norm_cent). Centroid
    norms are driver-side constants (``py_norm`` — bit-identical
    float64 math); the row norm is ONE fold reused across all m
    centroid scores. Same emitted doubles as inlining ``cosine`` m
    times, at m+1 folds per row instead of 3m (Catalyst's
    CollapseProject keeps the multiply-referenced non-cheap norm alias
    in its own projection, so the fold really runs once).

    This is the INDEX-BUILD cost of the IVF family — O(N·m) dots, paid
    once and amortized over every query batch: at 100 TB the assigned
    corpus is written ``partitionBy(_cid)`` (see ``ivf_build``) and
    ``ivf_knn_join`` takes the pre-assigned frame. The Arrow matmul
    variant (``ivf_assign_arrow``) is ~10x faster when 1e-16 summation
    drift is acceptable; this one is for hash-exact oracles."""
    cents = sorted(centroids)
    # The centroid matrix rides in as a ONE-ROW broadcast frame
    # (ids/vectors/norms as three array columns) and scoring is a
    # single `transform` lambda over a constant-folded index sequence
    # — plan size is O(1) in m and the matrix ships once per executor
    # as a broadcast, not per-task in the serialized plan. The naive
    # per-centroid form (m structs, each holding a `_lit_vec` of dim
    # py4j-built literals and its own fold) costs m·dim py4j round
    # trips just to BUILD the plan — measured 13 s of pure driver time
    # at m=447 (and `F.lit` on a nested list decomposes into the same
    # per-element calls, so it is no better).
    m = len(cents)
    cent_df = df.sparkSession.createDataFrame(
        [
            (
                [int(cid) for cid, _ in cents],
                [[float(x) for x in v] for _, v in cents],
                [py_norm(v) for _, v in cents],
            )
        ],
        "_cids array<int>, _cvecs array<array<double>>, _cnorms array<double>",
    )
    sims = F.transform(
        F.sequence(F.lit(1), F.lit(m)),
        lambda i: F.struct(
            F.round(
                dot(F.col(vec_col), F.element_at(F.col("_cvecs"), i))
                / (F.col(norm_col) * F.element_at(F.col("_cnorms"), i)),
                4,
            ).alias("c"),
            (-F.element_at(F.col("_cids"), i)).alias("n"),
        ),
    )
    # sort_array desc over (sim, -cid): highest sim first, then lowest
    # cid — mirrors SQL `ORDER BY sim DESC, cid ASC`. The assignment
    # goes through explode_outer + a null check on the GENERATED
    # column: a plain explode (or a join-key null filter against the
    # raw argmax expression) makes the optimizer inline the whole
    # centroid-similarity expression into an inferred Filter — the
    # explode-tax / mega-filter anti-pattern (PLANS.md round-3 note,
    # plans/lint.py). The slice is never empty for non-empty centroid
    # lists, so no rows are lost.
    best = F.slice(F.sort_array(sims, asc=False), 1, nprobe)
    return (
        df.crossJoin(F.broadcast(cent_df))
        .withColumn(norm_col, norm(F.col(vec_col)))
        .withColumn("_p", F.explode_outer(best))
        .filter(F.col("_p").isNotNull())
        .withColumn("_cid", -F.col("_p.n"))
        .drop("_p", "_cids", "_cvecs", "_cnorms")
    )


def ivf_knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    q_vec: str = "qv",
    c_vec: str = "rv",
    q_id: str = "qid",
    c_id: str = "rid",
) -> DataFrame:
    """Batch ANN kNN join: every query row gets its top-``k`` corpus
    neighbors WITHOUT a query×corpus cross join.

    IVF shape: corpus rows are assigned to their nearest centroid,
    each query probes its ``nprobe`` nearest centroids, and candidates
    meet on an EQUALITY join over the centroid id — per-query work is
    the probed posting lists (~nprobe/m of the corpus), not the corpus.
    An exact cosine re-rank of the candidates picks the final top-k
    (4-decimal rank key + id tiebreak — deterministic cross-engine).

    Everything is JVM column expressions (the HOF cosine fold), so
    emitted similarities are bit-comparable with a SQL replay of the
    same plan — this is the oracle-exact batch path; single-query
    probes over a materialized index use `ann_ivf_probe`
    (partition-pruned) and the Arrow assignment (`ivf_assign_arrow`)
    is the throughput variant when 1e-16 summation drift is acceptable.

    At 100 TB: m grows ~√N (train with `kmeans`), the O(N·m) corpus
    assignment is the one-time index build — pass a frame already
    carrying ``_cid``/``_rn`` (from ``ivf_corpus_assign`` or a
    ``partitionBy(_cid)``-written `ivf_build` table) and this join
    skips it, paying only the probes + posting-list candidates. The
    candidate equality join is the only wide op. Recall is the
    nprobe/m lever; precision of the emitted ranks is exact over the
    probed set. Ascending-cid centroid order is the documented
    tie-break (rounded similarity ties pick the lowest id).
    """
    cents = sorted(centroids)
    # Index-reuse accepts BOTH pre-assigned shapes: `ivf_corpus_assign`
    # frames (_cid, _rn) and `ivf_build` tables read back from parquet
    # (_centroid from the Arrow assignment, no norm column — rename and
    # add the one narrow norm fold; recomputing the O(N·m) assignment
    # because of a column-name mismatch would silently turn the
    # amortized one-time index build into a per-batch rebuild).
    corp = corpus
    if "_centroid" in corp.columns and "_cid" not in corp.columns:
        corp = corp.withColumnRenamed("_centroid", "_cid")
    if "_cid" in corp.columns:
        if "_rn" not in corp.columns:
            corp = corp.withColumn("_rn", norm(F.col(c_vec)))
    else:
        corp = ivf_corpus_assign(corp, cents, vec_col=c_vec)
    probes = (
        ivf_corpus_assign(
            queries, cents, vec_col=q_vec, nprobe=nprobe, norm_col="_qn"
        )
    )
    cand = probes.join(corp, "_cid").drop("_cid")
    w = Window.partitionBy(q_id).orderBy(
        F.desc("cos_sim"), F.asc(c_id)
    )
    return (
        cand.withColumn(
            "cos_sim",
            F.round(
                dot(F.col(q_vec), F.col(c_vec)) / (F.col("_qn") * F.col("_rn")), 4
            ),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop(q_vec, c_vec, "_qn", "_rn")
    )
