"""Data-quality profiling (SURVEY.md §2.5 A2-A6, §2.9 V4-V5).

Reference ``DataQualityValidator`` (data_validators.py:135-193):
min-record count, per-column null%, full-row duplicate%, zero-variance
numeric columns — each a separate pandas pass. Here: ONE wide
aggregation over the table (single scan, partial aggs map-side), with
thresholds applied to the tiny result driver-side, exactly like the
reference's warning semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Row, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# data_validators.py:140-144 defaults
DEFAULT_RULES = {
    "min_records": 1,
    "max_null_percentage": 0.5,
    "max_duplicate_percentage": 0.1,
}


def null_profile(df: DataFrame) -> DataFrame:
    """A2: per-column null fraction, one row out."""
    n = F.count(F.lit(1))
    aggs = [
        F.round(
            F.sum(F.col(c).isNull().cast("long")) / n, 6
        ).alias(c)
        for c in df.columns
    ]
    return df.agg(*aggs)


def duplicate_stats(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A3: duplicate-row count/fraction over (a subset of) columns.

    ``count(*) - countDistinct(struct(cols))`` needs only one shuffle of
    partial distinct sketches, not a full-row groupBy."""
    cols = cols or df.columns
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        (F.count(F.lit(1)) - F.count_distinct(F.struct(*cols))).alias("duplicate_rows"),
        F.round(
            (F.count(F.lit(1)) - F.count_distinct(F.struct(*cols)))
            / F.count(F.lit(1)),
            6,
        ).alias("duplicate_fraction"),
    )


def numeric_variance_profile(df: DataFrame) -> DataFrame:
    """A4: stddev per numeric column (zero-variance detection)."""
    nums = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.LongType, T.IntegerType))
    ]
    return df.agg(*[F.round(F.stddev(c), 6).alias(c) for c in nums])


def quality_report(
    df: DataFrame, rules: dict | None = None, dup_cols: list[str] | None = None
) -> dict:
    """V4: full quality pass → metrics dict + warnings, mirroring
    ``DataQualityValidator.validate`` (data_validators.py:146-193) but
    in ONE scan (all profiles in a single agg)."""
    rules = {**DEFAULT_RULES, **(rules or {})}
    cols = df.columns
    dup_cols = dup_cols or cols
    nums = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.DoubleType, T.FloatType, T.LongType, T.IntegerType))
    ]
    n = F.count(F.lit(1))
    aggs = [n.alias("_total")]
    aggs += [F.sum(F.col(c).isNull().cast("long")).alias(f"_null_{c}") for c in cols]
    aggs.append((n - F.count_distinct(F.struct(*dup_cols))).alias("_dups"))
    aggs += [F.stddev(c).alias(f"_std_{c}") for c in nums]
    row: Row = df.agg(*aggs).collect()[0]

    total = row["_total"]
    warnings: list[str] = []
    if total < rules["min_records"]:
        warnings.append(f"Record count {total} below minimum {rules['min_records']}")
    null_pcts = {c: (row[f"_null_{c}"] / total if total else 0.0) for c in cols}
    for c, pct in null_pcts.items():
        if pct > rules["max_null_percentage"]:
            warnings.append(f"Column '{c}' has {pct:.1%} null values")
    dup_pct = row["_dups"] / total if total else 0.0
    if dup_pct > rules["max_duplicate_percentage"]:
        warnings.append(f"Duplicate rate {dup_pct:.1%} exceeds threshold")
    zero_var = [c for c in nums if row[f"_std_{c}"] is not None and row[f"_std_{c}"] == 0.0]
    for c in zero_var:
        warnings.append(f"Column '{c}' has zero variance")

    return {
        "is_valid": True,  # quality issues warn, never fail (data_validators.py:193)
        "warnings": warnings,
        "metrics": {
            "total_records": total,
            "null_percentages": null_pcts,
            "duplicate_percentage": dup_pct,
            "zero_variance_columns": zero_var,
            "column_types": dict(df.dtypes),  # A6
        },
    }


@dataclass
class ValidationResult:
    """data_validators.py:15-43 result object."""

    is_valid: bool = True
    errors: list = field(default_factory=list)
    warnings: list = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


class ValidationPipeline:
    """V5: compose named validators over one DataFrame
    (data_validators.py:270-308)."""

    def __init__(self, validators: dict[str, callable]):
        self.validators = validators

    def validate(self, df: DataFrame) -> dict[str, ValidationResult]:
        results = {}
        for name, fn in self.validators.items():
            try:
                out = fn(df)
                if isinstance(out, dict):
                    results[name] = ValidationResult(
                        is_valid=out.get("is_valid", True),
                        warnings=out.get("warnings", []),
                        metrics=out.get("metrics", {}),
                    )
                else:
                    results[name] = out
            except Exception as exc:  # error-tolerance (V6)
                results[name] = ValidationResult(is_valid=False, errors=[str(exc)])
        return results

    @staticmethod
    def get_summary(results: dict[str, ValidationResult]) -> dict:
        return {
            "total_validators": len(results),
            "total_errors": sum(len(r.errors) for r in results.values()),
            "total_warnings": sum(len(r.warnings) for r in results.values()),
            "overall_valid": all(r.is_valid for r in results.values()),
        }


def observed(df: DataFrame, name: str = "etl_stats", *metrics: Column):
    """A7: pipeline run statistics (the reference's running extracted/
    transformed/loaded/failed counters, ``base_extractors.py:26-28``,
    ``data_transformers.py:313-324``, ``base_loaders.py:438-451``)
    collected Spark-natively with the ``Observation`` API: metrics are
    computed ON the job that materializes the DataFrame — zero extra
    passes, unlike the reference's per-record counter increments.

    Returns ``(df_observed, observation)``; read ``observation.get``
    after an action. Default metrics: row count + null-flag count of
    ``_is_valid`` if present.
    """
    from pyspark.sql import Observation

    if not metrics:
        ms = [F.count(F.lit(1)).alias("n_rows")]
        if "_is_valid" in df.columns:
            ms.append(
                F.sum(F.when(~F.col("_is_valid"), 1).otherwise(0)).alias("n_invalid")
            )
        metrics = tuple(ms)
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    bucket_width: float,
    n_buckets: int = 10,
) -> DataFrame:
    """Population Stability Index between two slices of a numeric
    column — the standard drift alarm between a reference window and a
    new window of the same feed (PSI < 0.1 stable, > 0.25 shifted).

    Fixed-width bucketing (top bucket clamps the tail) so the bucket
    map is identical on both sides and across engines; PSI terms are
    computed only for buckets populated on BOTH sides (the usual
    epsilon fudge is engine-dependent; dropping empty buckets is
    deterministic). Each side is one partial/final agg over its scan —
    the join afterwards touches n_buckets rows.

    Returns one row: (psi, n_buckets_compared).
    """
    top = n_buckets - 1

    def dist(df: DataFrame, name: str) -> DataFrame:
        b = F.least(F.floor(F.col(value_col) / bucket_width), F.lit(top)).cast("long")
        out = df.groupBy(b.alias("bucket")).agg(F.count(F.lit(1)).alias("_n"))
        total = out.agg(F.sum("_n").alias("_t")).select("_t")
        return (
            out.crossJoin(F.broadcast(total))
            .select("bucket", (F.col("_n") / F.col("_t")).alias(name))
        )

    a = dist(df_a, "p")
    b = dist(df_b, "q")
    terms = a.join(b, "bucket").select(
        ((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("_term")
    )
    return terms.agg(
        F.round(F.sum("_term"), 4).alias("psi"),
        F.count(F.lit(1)).alias("n_buckets_compared"),
    )


def k_anonymity_profile(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """Privacy-release audit: a dataset is k-anonymous over a set of
    quasi-identifier columns when every combination of their values
    covers at least k rows. Returns ONE row: number of violating
    groups, rows at risk, and the minimum group size observed (= the
    actual k the data achieves). One map-side-combined aggregation —
    the audit costs a single shuffle of group keys at any scale."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return groups.agg(
        F.sum((F.col("_n") < k).cast("long")).alias("n_groups_lt_k"),
        F.coalesce(
            F.sum(F.when(F.col("_n") < k, F.col("_n"))), F.lit(0)
        ).cast("long").alias("n_rows_at_risk"),
        F.min("_n").cast("long").alias("min_group_size"),
        F.count(F.lit(1)).alias("n_groups"),
    )


def ks_drift(df_a: DataFrame, df_b: DataFrame, value_col: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between two
    slices of a numeric column: KS = max_x |F_a(x) - F_b(x)|.

    Computed in INTEGER space: at each observed value v the empirical
    CDFs are cum_a/n_a and cum_b/n_b, so the scaled difference
    |cum_a·n_b - cum_b·n_a| is exact in BIGINT and the statistic is a
    single exact ratio — engine-independent, value-hash checkable (no
    float accumulation). Ties are handled by the window's default
    RANGE frame, which includes peer rows — exactly "all rows <= v".

    Returns one row: (n_a, n_b, ks_scaled, ks) where
    ks = ks_scaled / (n_a·n_b), rounded 6dp.

    Scale note: the CDF needs ONE global ordering of both samples —
    a single-task sort at the limit. This is the exact small/medium-
    sample audit (drift investigations, CI gates on holdout slices);
    for always-on 100 TB monitoring use `psi_drift`, whose fixed
    buckets keep everything partial-aggregatable.

    NULLs carry no distribution information and are dropped from both
    samples (they would otherwise sort first in the window and inflate
    every subsequent cumulative count, skewing both the statistic and
    n_a/n_b)."""
    u = df_a.filter(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"), F.lit(1).alias("_a"), F.lit(0).alias("_b")
    ).unionAll(
        df_b.filter(F.col(value_col).isNotNull()).select(
            F.col(value_col).alias("_v"), F.lit(0).alias("_a"), F.lit(1).alias("_b")
        )
    )
    w = Window.orderBy("_v")  # default RANGE frame: peers included
    cum = u.select(
        F.sum("_a").over(w).alias("_ca"), F.sum("_b").over(w).alias("_cb")
    )
    return (
        cum.crossJoin(
            F.broadcast(
                u.agg(
                    F.sum("_a").cast("long").alias("n_a"),
                    F.sum("_b").cast("long").alias("n_b"),
                )
            )
        )
        .groupBy("n_a", "n_b")
        .agg(
            F.max(
                F.abs(F.col("_ca") * F.col("n_b") - F.col("_cb") * F.col("n_a"))
            ).cast("long").alias("ks_scaled")
        )
        .select(
            "n_a",
            "n_b",
            "ks_scaled",
            F.round(F.col("ks_scaled") / (F.col("n_a") * F.col("n_b")), 6).alias("ks"),
        )
    )


def exact_corr_matrix(df: DataFrame, int_cols: dict[str, F.Column]) -> DataFrame:
    """Pairwise Pearson correlation over EXACT-INTEGER columns, long
    format: (var_x, var_y, n_rows, corr_ppm).

    ``int_cols`` maps names to integer-valued expressions (money →
    cents via round(x*100), counts as-is). All moments — Σx, Σx², Σxy —
    accumulate as decimal(38,0) sums of exact per-row integer products
    in ONE wide aggregation (single scan, map-side partials — the
    psi/ks profiling shape), so the correlation is a deterministic
    function of exact integers: both engines cast the same integers to
    the same doubles and run the same formula, making the result
    hash-exact cross-engine where a float accumulation would drift
    with partition count. Emitted as floor(corr·1e6) — floor of
    identical doubles is engine-exact where round() is not (DuckDB
    rounds shortest-decimal, Spark rounds the binary expansion).

    100 TB shape: one scan, dim²/2 decimal accumulators, no shuffle
    beyond the 1-row partial-agg merge. Per-row products must fit
    int64 (|x·y| < 9.2e18 — cents×cents is safe to ~$9.5e7 values);
    the SUMS get 38 digits.
    """
    names = list(int_cols)
    proj = df.select(
        *[expr.cast("long").alias(n) for n, expr in int_cols.items()]
    ).na.drop()
    aggs = [F.count(F.lit(1)).alias("_n")]
    for n in names:
        aggs.append(F.sum(F.col(n).cast("decimal(38,0)")).alias(f"_s_{n}"))
        aggs.append(
            F.sum((F.col(n) * F.col(n)).cast("decimal(38,0)")).alias(f"_s2_{n}")
        )
    # Product-sum aliases are INDEX-based: name-concatenation collides
    # for underscore names (pairs (a, b_c) and (a_b, c) both render
    # "_sp_a_b_c" → ambiguous-column AnalysisException or a silently
    # wrong binding).
    for i, a in enumerate(names):
        for j, b in enumerate(names[i + 1 :], start=i + 1):
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,0)")).alias(f"_sp_{i}_{j}")
            )
    row = proj.agg(*aggs)
    nd = F.col("_n").cast("double")
    pairs = []
    for i, a in enumerate(names):
        for j, b in enumerate(names[i + 1 :], start=i + 1):
            sx = F.col(f"_s_{a}").cast("double")
            sy = F.col(f"_s_{b}").cast("double")
            sxx = F.col(f"_s2_{a}").cast("double")
            syy = F.col(f"_s2_{b}").cast("double")
            sxy = F.col(f"_sp_{i}_{j}").cast("double")
            corr = (nd * sxy - sx * sy) / (
                F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
            )
            # float error can push a perfect correlation a ulp past the
            # mathematical [-1, 1] rails; clamp so floor(corr·1e6) hits
            # exactly ±1e6 there (mirrored in the oracle SQL)
            corr = F.greatest(F.lit(-1.0), F.least(F.lit(1.0), corr))
            pairs.append(
                F.struct(
                    F.lit(a).alias("var_x"),
                    F.lit(b).alias("var_y"),
                    F.floor(corr * F.lit(1000000.0)).cast("long").alias("corr_ppm"),
                )
            )
    return (
        row.withColumn("_pair", F.explode_outer(F.array(*pairs)))
        .filter(F.col("_pair").isNotNull())
        .select(
            F.col("_pair.var_x").alias("var_x"),
            F.col("_pair.var_y").alias("var_y"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col("_pair.corr_ppm").alias("corr_ppm"),
        )
    )


def spearman_corr(
    df: DataFrame, x: str, y: str, x_int: F.Column | None = None,
    y_int: F.Column | None = None, max_distinct: int = 20_000_000,
) -> DataFrame:
    """Spearman rank correlation with average ranks for ties —
    WITHOUT a global sort: per-value average ranks come from a value
    HISTOGRAM (groupBy value → count, cumulative count over the
    ordered distinct values), and average ranks are multiples of 0.5,
    so ``rank2 = 2·avg_rank = 2·cum_before + cnt + 1`` is an EXACT
    integer. Pearson on the rank2 columns (scale factors cancel) via
    the same exact-integer moment machinery as ``exact_corr_matrix``
    → hash-exact cross-engine.

    100 TB shape: two value-histogram aggregations (map-side partial,
    #distinct-values keys), a window over the distinct values only
    (bounded, not the corpus), two joins back on the value — hint-free
    so AQE broadcasts a small histogram but shuffle-joins a near-unique
    one (a forced broadcast would OOM when values are ~distinct). No
    corpus-wide sort, no unbounded buffers. Returns one row:
    (n_rows, spearman_ppm).

    The bounded-by-distinct-values claim is ENFORCED, not assumed:
    each histogram passes the ``bounded_hist`` cardinality guard
    (``max_distinct``) before its unpartitioned window, so a caller
    passing a near-unique column fails fast instead of silently
    single-task-sorting the corpus.
    """
    xi = (x_int if x_int is not None else F.col(x)).cast("long").alias("_x")
    yi = (y_int if y_int is not None else F.col(y)).cast("long").alias("_y")
    base = df.select(xi, yi).na.drop()

    guards: list[DataFrame] = []

    def rank2(col: str) -> DataFrame:
        hist = base.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        hist = bounded_hist(hist, max_distinct, f"spearman_corr({col})")
        guards.append(hist)
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return hist.select(
            col,
            (
                2 * F.coalesce(F.sum("_c").over(w), F.lit(0)) + F.col("_c") + 1
            ).alias(f"{col}_r2"),
        )
    ranked = base.join(rank2("_x"), "_x").join(rank2("_y"), "_y")
    out = exact_corr_matrix(
        ranked, {"rx": F.col("_x_r2"), "ry": F.col("_y_r2")}
    )
    out = out.select(
        F.col("n_rows"), F.col("corr_ppm").alias("spearman_ppm")
    )
    # One row out; release both rank histograms on the way (the caller
    # can never unpersist them — it only sees the result frame).
    return _finalize_release(out, *guards)


def exact_linreg(
    df: DataFrame,
    group_cols: list[str],
    x_int: F.Column,
    y_int: F.Column,
) -> DataFrame:
    """Per-group simple linear regression (y on x) over EXACT-INTEGER
    expressions: slope/intercept/R² from decimal(38,0) moment sums in
    ONE grouped aggregation — the `exact_corr_matrix` machinery with a
    GROUP BY, hash-exact cross-engine for the same reason. Groups with
    zero x-variance are dropped (no defined slope), mirrored in the
    oracle. Emits floor-scaled integers: slope_ppm (slope·1e6),
    intercept_c (floor intercept), r2_ppm.

    100 TB shape: one scan, map-side partial aggregation to
    #groups·5 decimal accumulators — the classic sufficient-statistics
    pattern (no per-group iteration, no second pass).
    """
    base = df.select(
        *group_cols,
        x_int.cast("long").alias("_x"),
        y_int.cast("long").alias("_y"),
    ).na.drop()
    agg = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sx"),
        F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
        F.sum((F.col("_x") * F.col("_x")).cast("decimal(38,0)")).alias("_sxx"),
        F.sum((F.col("_y") * F.col("_y")).cast("decimal(38,0)")).alias("_syy"),
        F.sum((F.col("_x") * F.col("_y")).cast("decimal(38,0)")).alias("_sxy"),
    )
    nd = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    syy = F.col("_syy").cast("double")
    sxy = F.col("_sxy").cast("double")
    den_x = nd * sxx - sx * sx
    den_y = nd * syy - sy * sy
    num = nd * sxy - sx * sy
    slope = num / den_x
    intercept = (sy - slope * sx) / nd
    r2 = F.when(den_y == 0.0, F.lit(1.0)).otherwise(
        F.greatest(
            F.lit(0.0), F.least(F.lit(1.0), (num * num) / (den_x * den_y))
        )
    )
    return (
        agg.filter(den_x > 0.0)
        .select(
            *group_cols,
            F.col("_n").cast("long").alias("n_rows"),
            F.floor(slope * F.lit(1000000.0)).cast("long").alias("slope_ppm"),
            F.floor(intercept).cast("long").alias("intercept_c"),
            F.floor(r2 * F.lit(1000000.0)).cast("long").alias("r2_ppm"),
        )
    )


# Benford's-law expected first-digit shares, fixed-point parts-per-
# million. Literal constants (not computed via log10 at query time) so
# both engines compare the exact same integers — floor(log10(1+1/d)*1e6).
BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910,
    5: 79181, 6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_profile(df: DataFrame, amount_cents: F.Column) -> DataFrame:
    """First-significant-digit distribution of a positive money column
    vs Benford's law (reference data_validators.py has threshold-style
    plausibility checks; this is the classic fraud/corruption screen a
    lake-wide quality suite adds on top).

    The first digit is taken from the CENTS integer's decimal string —
    no ``log10``/``pow`` on doubles, whose floor can mis-round on exact
    powers of ten and diverge between engines. Emits one row per digit
    with exact counts and an exact-integer deviation in ppm units.

    100 TB: one scan → 9-group hash aggregate; partial aggregation
    makes the shuffle 9 rows per task.
    """
    exp_ppm = F.create_map(
        *[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]
    )[F.col("digit")]
    per = (
        df.select(amount_cents.cast("long").alias("_c"))
        .filter(F.col("_c") > 0)
        .select(F.substring(F.col("_c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    total = per.agg(F.sum("obs").alias("_n"))
    return (
        per.crossJoin(total)
        .select(
            "digit",
            F.col("obs").cast("long").alias("obs"),
            exp_ppm.cast("long").alias("benford_ppm"),
            # observed share in ppm — integer `div`, never a double
            # division whose trunc can land one off an exact quotient
            F.expr("(obs * CAST(1000000 AS BIGINT)) div _n")
            .cast("long")
            .alias("obs_ppm"),
        )
        .withColumn("dev_ppm", (F.col("obs_ppm") - F.col("benford_ppm")).cast("long"))
        .orderBy("digit")
    )


def referential_integrity(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit across a star schema: one row per FK
    edge with child row count, NULL-FK count, and orphan count (non-
    NULL FK with no matching parent key). Reference
    data_validators.py:161-193 checks per-table rules only; cross-table
    integrity is the natural lake-wide extension.

    Each edge is a left join against the DISTINCT parent keys — dims
    stay broadcast-size and AQE picks broadcast-hash automatically
    (hint-free, so the one big-big edge, e.g. lineitem→orders, falls
    back to a shuffle join instead of an OOM broadcast at 100 TB).
    """
    # Group edges by child table so each child is SCANNED ONCE for all
    # its FK edges (lineitem carries three FKs — one pass, three key
    # joins, one aggregation — instead of three full scans). The key
    # sides are DISTINCT parents joined 1:1, so chaining left joins
    # never multiplies rows.
    by_child: dict[int, list[int]] = {}
    for i, (_, child, _, _, _) in enumerate(edges):
        by_child.setdefault(id(child), []).append(i)
    outs: list[DataFrame] = []
    for idxs in by_child.values():
        child = edges[idxs[0]][1]
        j = child.select(
            *[F.col(edges[i][2]).alias(f"_fk_{i}") for i in idxs]
        )
        for i in idxs:
            name, _, fk, parent, pk = edges[i]
            keys = parent.select(F.col(pk).alias(f"_pk_{i}")).distinct()
            j = j.join(keys, F.col(f"_fk_{i}") == F.col(f"_pk_{i}"), "left")
        aggs = [F.count(F.lit(1)).alias("_n")]
        for i in idxs:
            aggs.append(
                F.sum(F.col(f"_fk_{i}").isNull().cast("long")).alias(f"_null_{i}")
            )
            aggs.append(
                F.sum(
                    (F.col(f"_fk_{i}").isNotNull() & F.col(f"_pk_{i}").isNull())
                    .cast("long")
                ).alias(f"_orph_{i}")
            )
        wide = j.agg(*aggs)
        items = F.array(
            *[
                F.struct(
                    F.lit(edges[i][0]).alias("edge"),
                    F.col("_n").cast("long").alias("child_rows"),
                    F.col(f"_null_{i}").cast("long").alias("null_fks"),
                    F.col(f"_orph_{i}").cast("long").alias("orphans"),
                )
                for i in idxs
            ]
        )
        outs.append(wide.select(F.explode(items).alias("x")).select("x.*"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def entropy_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy (nats, 4 dp) + distinct count + modal share per
    categorical column — the information-content screen a curation
    pipeline runs before choosing stratification / partition keys
    (low-entropy column ⇒ useless stratifier, skewed partitioner).

    One grouped count per column (map-side partials), entropy folded
    from the tiny per-value frame. NULLs are their own category.
    """
    outs: list[DataFrame] = []
    for c in cols:
        counts = (
            df.select(F.coalesce(F.col(c).cast("string"), F.lit("∅")).alias("_v"))
            .groupBy("_v")
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        outs.append(
            counts.agg(
                F.count(F.lit(1)).alias("n_distinct"),
                F.sum("_cnt").alias("_n"),
                F.max("_cnt").alias("_top"),
                F.sum(F.col("_cnt") * F.log(F.col("_cnt").cast("double"))).alias("_slc"),
            )
            .select(
                F.lit(c).alias("column"),
                F.col("n_distinct").cast("long").alias("n_distinct"),
                # H = ln(N) - (1/N)·Σ c·ln(c), exact-count inputs
                F.round(
                    F.log(F.col("_n").cast("double"))
                    - F.col("_slc") / F.col("_n").cast("double"),
                    4,
                ).alias("entropy_nats"),
                F.expr("(_top * CAST(1000000 AS BIGINT)) div _n")
                .cast("long")
                .alias("modal_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def _finalize_release(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a stat operator's (tiny) result, then release the
    histogram/projection caches it was built from. The guard persists
    are only 'free for the reuse that follows' if they are BOTH reused
    within the operator AND dropped when it finishes — in a long-lived
    session (the driver runs the full registry in one JVM) leaked
    caches accumulate until LRU eviction and tax every later query."""
    out = out.localCheckpoint(eager=True)
    for f in cached:
        f.unpersist()
    return out


def bounded_hist(hist: DataFrame, max_distinct: int, context: str) -> DataFrame:
    """Guard a value HISTOGRAM before it feeds an unpartitioned window.

    The histogram constructions in this module (spearman_corr,
    exact_percentiles, customer_balance_deciles) are safe at 100 TB
    only because the window sorts DISTINCT VALUES, not corpus rows —
    a bounded domain (2-decimal money, day-granular dates). Nothing
    used to *enforce* that: a caller passing a near-unique column
    (UUIDs, raw doubles) silently got a single-task sort of the corpus.
    This check persists the histogram (the count is then free for the
    reuse that follows) and fails fast with the actual cardinality
    instead.
    """
    hist = hist.persist()
    n = hist.count()
    if n > max_distinct:
        hist.unpersist()
        raise ValueError(
            f"{context}: value histogram has {n:,} distinct values, over the "
            f"{max_distinct:,} bound for an unpartitioned window — this column "
            "is too close to unique for the histogram construction; band the "
            "values first (e.g. floor to a coarser unit) or use an "
            "approx/partitioned method"
        )
    return hist


def exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    ps: dict[str, float],
    max_distinct: int = 20_000_000,
    finalize: bool = True,
) -> DataFrame:
    """Exact interpolated percentiles per group WITHOUT Spark's exact
    ``percentile`` aggregate, whose buffer holds every group value (a
    few groups at 100 TB = an unbounded single-buffer sort → OOM).

    Construction (the winsorized_price_rollup machinery, extracted):
    a value-histogram aggregation (bounded by DISTINCT values,
    map-side combinable), a per-group cumulative count over the
    ordered distinct values (the window sorts the histogram, never
    corpus rows), then the two order statistics each percentile
    interpolates between are picked with conditional aggregates. The
    interpolation reproduces Spark's Percentile.getPercentile formula
    bit-exactly (pos = (n-1)·p; lower·(1-rate) + higher·rate), so
    results are unchanged vs ``F.percentile`` — only the plan scales.
    Matches SQL ``percentile_cont(p) WITHIN GROUP (ORDER BY v)``.

    ``ps`` maps output column name -> fraction in [0, 1]. Returns one
    row per group: group_cols + one double column per entry. With
    ``group_cols=[]`` the cumulative window is global — it then runs
    behind the ``bounded_hist`` cardinality guard (``max_distinct``),
    and the guarded result is eagerly finalized so the histogram cache
    is RELEASED when the operator returns (``finalize=False`` keeps
    the lazy plan — for plan inspection or callers managing caches).

    NULL semantics: rows with NULL in ``value_col`` are ignored within
    a group (aggregate semantics, matches Spark/DuckDB). A group whose
    values are ALL NULL is DROPPED from the output — Spark's
    ``percentile`` aggregate instead emits that group with a NULL
    result; callers needing those rows should left-join this output
    back to the group domain (the divergence is only reachable when an
    entire group is NULL-valued).
    """
    vals = df.select(*group_cols, value_col).filter(F.col(value_col).isNotNull())
    hist = vals.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_c"))
    guarded = None
    if not group_cols:
        hist = bounded_hist(hist, max_distinct, f"exact_percentiles({value_col})")
        guarded = hist
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = hist.select(
        *group_cols,
        value_col,
        "_c",
        F.sum("_c").over(wcum).alias("_cum"),
        F.sum("_c").over(wg).alias("_n"),
    )

    def _stat(p: float, which: str):
        # 0-based rank the percentile interpolates from (`lo`) / to
        # (`hi`); histogram row (value v, count c, cumulative m) covers
        # ranks [m-c, m-1], so exactly one row matches each rank.
        pos = (F.col("_n") - 1).cast("double") * F.lit(p)
        k = F.floor(pos).cast("long") if which == "lo" else F.ceil(pos).cast("long")
        hit = (F.col("_cum") - F.col("_c") <= k) & (k < F.col("_cum"))
        return F.max(F.when(hit, F.col(value_col)))

    def _interp(p: float, lo_col: str, hi_col: str):
        # Spark's Percentile.getPercentile, operation-for-operation:
        # short-circuit when the two positions land on the SAME KEY
        # (equal values or integral position — Spark returns the key
        # itself, no arithmetic), else (hiIdx - pos)·lo +
        # (pos - loIdx)·hi over the FULL-magnitude index doubles.
        # Algebraically equal alternatives ((1-rate)·lo + rate·hi,
        # lo + (hi-lo)·rate) each differ from it by 1 ulp on some
        # inputs — the hypothesis property test found both — so only
        # the exact operation order keeps the bit-parity claim true.
        pos = (F.col("_n") - 1).cast("double") * F.lit(p)
        lo_i = F.floor(pos).cast("double")
        hi_i = F.ceil(pos).cast("double")
        lo = F.col(lo_col).cast("double")
        hi = F.col(hi_col).cast("double")
        return F.when((hi_i == lo_i) | (lo == hi), lo).otherwise(
            (hi_i - pos) * lo + (pos - lo_i) * hi
        )

    aggs = []
    for name, p in ps.items():
        aggs.append(_stat(p, "lo").alias(f"_{name}_lo"))
        aggs.append(_stat(p, "hi").alias(f"_{name}_hi"))
    out = (
        cum.groupBy(*group_cols, "_n")
        .agg(*aggs)
        .select(
            *group_cols,
            *[
                _interp(p, f"_{name}_lo", f"_{name}_hi").alias(name)
                for name, p in ps.items()
            ],
        )
    )
    if guarded is not None and finalize:
        out = _finalize_release(out, guarded)
    return out


def mad_outlier_stats(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    z: float = 3.0,
    max_distinct: int = 20_000_000,
) -> DataFrame:
    """Robust per-group outlier profile: median, MAD (median absolute
    deviation), and the count of rows beyond ``z`` MADs — the
    outlier screen that, unlike mean±k·stddev, a heavy tail cannot
    drag (the tail IS what moves the mean and inflates the stddev).

    Both order statistics come from ``exact_percentiles`` (value
    histograms — map-side combinable, no percentile buffer), so the
    plan is two grouped histogram aggregations + two broadcast joins
    of tiny per-group stat frames; deviations are never materialized
    beyond the second histogram's input projection. Emits
    floor-cents integers for the stats (engine-exact) and exact
    counts. One row per group:
    (group_cols..., n_rows, med_c, mad_c, n_outliers).
    """
    med = exact_percentiles(
        df, group_cols, value_col, {"_med": 0.5}, max_distinct=max_distinct
    )
    j = df.select(*group_cols, value_col).join(F.broadcast(med), group_cols)
    # The deviation projection feeds BOTH the MAD histogram and the
    # final flag count — persist it so the corpus is scanned once, not
    # once per consumer (narrow 3-column frame; at 100 TB this is the
    # standard cache-the-projection step between two order-statistics
    # passes, and disk spill is still cheaper than a second full scan).
    dev = j.select(
        *group_cols,
        "_med",
        F.abs(F.col(value_col) - F.col("_med")).alias("_adev"),
    ).persist()
    mad = exact_percentiles(
        dev, group_cols, "_adev", {"_mad": 0.5}, max_distinct=max_distinct
    )
    flagged = dev.join(F.broadcast(mad), group_cols)
    out = flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.floor(F.max("_med") * 100).cast("long").alias("med_c"),
        F.floor(F.max("_mad") * 100).cast("long").alias("mad_c"),
        F.sum(
            (F.col("_adev") > F.lit(float(z)) * F.col("_mad")).cast("long")
        ).alias("n_outliers"),
    )
    # One row per group out; drop the corpus-wide deviation cache now
    # that both consumers (MAD histogram + flag count) have run.
    return _finalize_release(out, dev)
