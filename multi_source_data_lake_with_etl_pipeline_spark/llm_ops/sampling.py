"""Deterministic hash-based sampling for training-data curation.

``df.sample()`` is seed-and-partitioning dependent: re-running after a
repartition (or on a different cluster layout) yields a different
subset, which breaks reproducible corpus construction. The operators
here derive the keep/drop decision from a hash of a stable key column,
so the same row is kept on every run, on every engine, at every
partition count — and membership is decidable row-locally with zero
shuffles (a narrow filter that Catalyst pushes into the scan).

Portability trick: Spark and DuckDB (and Postgres, etc.) all render
``md5(key_string)`` as the same lowercase hex, and lowercase hex
strings order lexicographically exactly like their numeric values —
so ``substr(md5(key), 1, 4) < '1999'`` is a portable "keep with
probability 0x1999/0x10000" predicate with no integer-conversion
dialect trouble. Granularity is 1/65536, plenty for corpus sampling.

Reference parity: extends the reference's fixed LIMIT-style subsetting
(src/api/main.py:154-176 caps result sets) with real reproducible
sampling, which it lacks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SPACE = 1 << 16  # 4 hex chars


def fraction_threshold(fraction: float) -> str:
    """Hex threshold string t such that P[substr(md5(k),1,4) < t] ≈ fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    n = min(int(round(fraction * _SPACE)), _SPACE)
    if n >= _SPACE:
        return "g"  # > every hex string of length 4
    return format(n, "04x")


def hash_bucket(key: Column, salt: str = "") -> Column:
    """First 4 hex chars of md5(salt || key) — the row's stable
    uniform draw, as a portable hex string."""
    k = F.concat(F.lit(salt), key.cast("string")) if salt else key.cast("string")
    return F.substring(F.md5(k), 1, 4)


def keep_fraction(key: Column, fraction: float, salt: str = "") -> Column:
    """Boolean: row survives a deterministic ``fraction`` sample."""
    return hash_bucket(key, salt) < F.lit(fraction_threshold(fraction))


def sample_fraction(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample keyed on ``key_col``."""
    return df.filter(keep_fraction(F.col(key_col), fraction, salt))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources, keep all rare-language docs).

    The per-stratum threshold is a small CASE expression — still a
    row-local filter, still pushed to the scan; no join, no shuffle,
    no driver-side stratum enumeration. For a very large (or dynamic)
    strata map, join a broadcast rates table instead and filter on
    ``hash_bucket(key) < threshold_col`` — same predicate shape.
    """
    thr: Column = F.lit(fraction_threshold(default))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == stratum, F.lit(fraction_threshold(frac))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), salt) < thr)


def split_train_holdout(
    df: DataFrame, key_col: str, holdout_fraction: float = 0.01, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint deterministic train/holdout split (same predicate,
    negated — a row can never land in both, on any run)."""
    keep = keep_fraction(F.col(key_col), holdout_fraction, salt)
    return df.filter(~keep), df.filter(keep)


def per_group_cap(
    df: DataFrame,
    group_col: str,
    cap: int,
    order_col: str,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, deterministically: the first
    ``cap`` rows ordered by ``order_col`` (Common-Crawl-style per-domain
    quotas — no single boilerplate source may dominate the corpus).

    One shuffle on ``group_col`` + a per-group sort. A pathological hot
    group still sorts on one reducer; when a group can exceed executor
    memory, pre-thin it with :func:`sample_fraction` keyed on
    ``order_col`` (deterministic, row-local) down to ~cap×10 before the
    exact rank — quota results are unchanged for every group under the
    pre-thin threshold and approximate only for whales."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def mix_to_budget(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    weights: dict[str, int],
    total_target: int,
    default_weight: int = 1,
    salt: str = "mix",
) -> DataFrame:
    """Data mixing: deterministically sample each stratum so the output
    approaches ``total_target`` rows split ∝ integer ``weights`` (the
    upweight-wiki / downweight-crawl step of corpus assembly), capped
    by each stratum's availability.

    One count aggregation collects per-stratum sizes (driver scalars);
    per-stratum thresholds use EXACT integer arithmetic —
    ``min(65536, (65536·total·w) // (Σw·n))`` — so any engine
    reproduces the same membership set from the same md5 draw. The
    filter itself is the usual row-local hash predicate: scan-pushed,
    zero shuffles, stable under repartitioning."""
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sum_w = sum(weights.get(s, default_weight) for s in counts)
    thresholds = {
        s: min(
            _SPACE,
            (_SPACE * total_target * weights.get(s, default_weight)) // (sum_w * n),
        )
        for s, n in counts.items()
    }
    thr: Column = F.lit("0000")
    keep_all: Column = F.lit(False)
    for s, t in sorted(thresholds.items()):
        if t >= _SPACE:
            keep_all = F.when(F.col(strata_col) == s, F.lit(True)).otherwise(keep_all)
        else:
            thr = F.when(F.col(strata_col) == s, F.lit(format(t, "04x"))).otherwise(thr)
    return df.filter(keep_all | (hash_bucket(F.col(key_col), salt) < thr))


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows per group
    (Efraimidis–Spirakis A-ES): rank rows by u^(1/w) — equivalently
    ln(u)/w — and keep the top k. Heavier rows win proportionally more
    often, no row repeats, and the whole draw is one window shuffle.

    Deterministic end-to-end: the uniform u in (0, 1] is the first 12
    hex digits of md5(salt || id) decoded with plain string functions
    (md5/substring/instr — identical semantics in Spark SQL and SQL
    oracles), +1, divided by 16^12; the divisor is a power of two so u
    is EXACT in IEEE double on any engine, leaving only ulp-level ln()
    drift, absorbed by the id tie-break. Resamples are reproducible
    and the draw is value-hash checkable against an external SQL
    oracle. Rows with weight <= 0 are excluded (their A-ES key is
    undefined).

    100 TB shape: one hash-partition sort per group — same cost as any
    per-group top-k; no driver state, no rejection loops. For global
    (ungrouped) sampling pass group_cols=[] — Spark plans a single
    total-ordering window, so at scale prefer a coarse group key."""
    h12 = F.substring(F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 12)
    # BIGINT literal suffix: under ANSI mode an INT*INT term overflows
    # at 16^8 before widening.
    terms = "+".join(
        f"(instr('0123456789abcdef', substring(_h12, {i}, 1)) - 1)"
        f" * {16 ** (12 - i)}L"
        for i in range(1, 13)
    )
    bound = df.filter(F.col(weight_col) > 0).withColumn("_h12", h12)
    u = (F.expr(terms).cast("double") + F.lit(1.0)) / F.lit(float(16**12))
    key = F.log(u) / F.col(weight_col)
    w = Window.partitionBy(*group_cols).orderBy(key.desc(), F.col(id_col))
    return (
        bound.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
        .drop("_h12")
    )


def epoch_upsample(
    df: DataFrame,
    strata_col: str,
    copies: dict[str, int],
    key_col: str,
    default_copies: int = 1,
) -> DataFrame:
    """Mixture UPsampling: replicate each stratum's rows an integer
    number of times (multi-epoch over-representation of scarce
    high-quality sources — the other half of mix_to_budget's
    downsampling). Adds ``_epoch`` (0-based copy index) and a
    deterministic ``_shuffle_key`` = md5(key || epoch) so downstream
    global ordering interleaves copies instead of clustering them.

    One explode over a literal-bounded sequence — no shuffle here; the
    training-order sort downstream is where the range exchange lives.
    """
    n = F.lit(default_copies)
    for s, c in sorted(copies.items()):
        n = F.when(F.col(strata_col) == s, F.lit(int(c))).otherwise(n)
    # copies=0 must DROP the stratum: Spark's sequence(0, -1) auto-steps
    # -1 and yields [0, -1] (two copies!) — guard with an empty array
    out = df.withColumn(
        "_epoch",
        F.explode(
            F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
                F.array().cast("array<int>")
            )
        ),
    )
    return out.withColumn(
        "_shuffle_key",
        F.md5(F.concat_ws("#", F.col(key_col).cast("string"), F.col("_epoch"))),
    )
