"""Validation operators (SURVEY.md §2.9 V1-V3).

Reference semantics: records are **kept and flagged**, never dropped —
``_validation_errors`` (list of messages), ``_is_valid``,
``_validated_at`` appended per record
(``data_transformers.py:93-136``); batch variant with metrics in
``data_validators.py:56-133``; business rules (range / relationship /
custom) in ``data_validators.py:195-268``.

Spark version: one expression pass builds an array of
``when(violated, msg)`` entries, compacts nulls with ``filter``, and
derives ``_is_valid = size(...) == 0``. Zero shuffles; scales linearly.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import EMAIL_RE, parse_date_multi


@dataclass
class FieldRule:
    """One field's rule set — the dict shape at data_validators.py:56-109
    / data_transformers.py:96-136."""

    field: str
    required: bool = False
    type: str | None = None  # string/integer/float/boolean/datetime/email
    min: float | None = None
    max: float | None = None
    min_length: int | None = None
    max_length: int | None = None


def _type_pred(c: Column, t: str) -> Column:
    """Type check over the *string rendering* when the physical type
    already matches, mirroring the reference's isinstance/regex checks
    (data_validators.py:111-133)."""
    if t == "email":
        return c.cast("string").rlike(EMAIL_RE)
    if t == "datetime":
        return parse_date_multi(c.cast("string")).isNotNull()
    if t == "integer":
        return c.cast("string").rlike(r"^-?\d+$")
    if t in ("float", "number"):
        return c.cast("string").rlike(r"^-?\d+(\.\d+)?$")
    if t == "boolean":
        return F.lower(c.cast("string")).isin("true", "false", "0", "1")
    if t == "string":
        return F.lit(True)  # every value renders as a string
    raise ValueError(f"unknown rule type: {t!r}")


def rule_error_exprs(rules: Sequence[FieldRule]) -> list[Column]:
    """Each rule → a Column that is the error message when violated,
    else null. Message texts mirror data_transformers.py:109-128."""
    errs: list[Column] = []
    for r in rules:
        c = F.col(r.field)
        if r.required:
            errs.append(
                F.when(
                    c.isNull() | (c.cast("string") == ""),
                    F.lit(f"Required field '{r.field}' is missing"),
                )
            )
        present = c.isNotNull() & (c.cast("string") != "")
        if r.type is not None:
            errs.append(
                F.when(
                    present & ~_type_pred(c, r.type),
                    F.lit(f"Field '{r.field}' has invalid {r.type} format"),
                )
            )
        if r.min is not None:
            errs.append(
                F.when(
                    present & (c.cast("double") < F.lit(r.min)),
                    F.lit(f"Field '{r.field}' below minimum {r.min}"),
                )
            )
        if r.max is not None:
            errs.append(
                F.when(
                    present & (c.cast("double") > F.lit(r.max)),
                    F.lit(f"Field '{r.field}' above maximum {r.max}"),
                )
            )
        if r.min_length is not None:
            errs.append(
                F.when(
                    present & (F.length(c.cast("string")) < r.min_length),
                    F.lit(f"Field '{r.field}' shorter than {r.min_length}"),
                )
            )
        if r.max_length is not None:
            errs.append(
                F.when(
                    present & (F.length(c.cast("string")) > r.max_length),
                    F.lit(f"Field '{r.field}' longer than {r.max_length}"),
                )
            )
    return errs


def validate(
    df: DataFrame, rules: Sequence[FieldRule], add_lineage: bool = False
) -> DataFrame:
    """V1: append ``_validation_errors`` / ``_is_valid`` (records kept,
    flagged — data_transformers.py:130-133)."""
    errs = rule_error_exprs(rules)
    err_array = F.array_compact(F.array(*errs)) if errs else F.array().cast("array<string>")
    out = df.withColumn("_validation_errors", err_array).withColumn(
        "_is_valid", F.size("_validation_errors") == 0
    )
    if add_lineage:
        out = out.withColumn("_validated_at", F.current_timestamp())
    return out


def filter_valid(df: DataFrame) -> DataFrame:
    """P5: keep records with no validation errors
    (test_system_integration.py:156-159)."""
    return df.filter(F.size("_validation_errors") == 0)


# ---------------------------------------------------------------------------
# V3: business rules — range / relationship / custom
# ---------------------------------------------------------------------------

_REL_OPS: dict[str, Callable[[Column, Column], Column]] = {
    "greater_than": lambda a, b: a > b,
    "less_than": lambda a, b: a < b,
    "equal": lambda a, b: a == b,
    "greater_equal": lambda a, b: a >= b,
    "less_equal": lambda a, b: a <= b,
    "not_equal": lambda a, b: a != b,
}


@dataclass
class BusinessRule:
    """data_validators.py:195-268 rule dict shape."""

    name: str
    type: str  # 'range' | 'relationship' | 'custom'
    field: str | None = None
    min: float | None = None
    max: float | None = None
    field1: str | None = None
    field2: str | None = None
    operator: str = "greater_than"
    predicate: Column | None = None  # custom: violation predicate Column


def business_rule_violation(rule: BusinessRule) -> Column:
    """Boolean Column: True where the rule is VIOLATED."""
    if rule.type == "range":
        c = F.col(rule.field)
        conds = []
        if rule.min is not None:
            conds.append(c < F.lit(rule.min))
        if rule.max is not None:
            conds.append(c > F.lit(rule.max))
        out = conds[0]
        for x in conds[1:]:
            out = out | x
        return c.isNotNull() & out
    if rule.type == "relationship":
        op = _REL_OPS[rule.operator]
        a, b = F.col(rule.field1), F.col(rule.field2)
        return a.isNotNull() & b.isNotNull() & ~op(a, b)
    if rule.type == "custom":
        if rule.predicate is None:
            raise ValueError("custom rule needs a violation predicate Column")
        return rule.predicate
    raise ValueError(f"unknown business rule type: {rule.type!r}")


def validate_business_rules(
    df: DataFrame, rules: Sequence[BusinessRule]
) -> DataFrame:
    """Violation counts per rule in ONE aggregation pass
    (data_validators.py:219-257 does a Python loop per rule)."""
    aggs = [
        F.sum(business_rule_violation(r).cast("long")).alias(r.name) for r in rules
    ]
    aggs.append(F.count(F.lit(1)).alias("_record_count"))
    return df.agg(*aggs)


@dataclass(frozen=True)
class Expectation:
    """One declarative data expectation (Great-Expectations-style
    contract; generalizes the reference's per-field rules
    data_validators.py:63-117 into a suite evaluated in ONE scan)."""

    name: str
    column: str
    kind: str  # not_null | unique | in_set | between | regex_match
    values: tuple = ()
    lo: float | int | str | None = None
    hi: float | int | str | None = None
    pattern: str | None = None


def _violation_expr(e: Expectation) -> Column:
    c = F.col(e.column)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "in_set":
        return c.isNotNull() & ~c.isin(*e.values)
    if e.kind == "between":
        return c.isNotNull() & ~c.between(e.lo, e.hi)
    if e.kind == "regex_match":
        return c.isNotNull() & ~c.rlike(e.pattern)
    raise ValueError(f"unknown expectation kind: {e.kind}")


def expectation_suite(df: DataFrame, expectations: Sequence[Expectation]) -> DataFrame:
    """Evaluate a whole expectation suite in ONE wide aggregation (map-
    side partials, a handful of longs per task — scan-speed at 100 TB).
    ``unique`` folds in as count - count_distinct in the same pass.
    Returns one row per expectation: n_rows, n_violations, passed.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for e in expectations:
        if e.kind == "unique":
            aggs.append(
                (F.count(e.column) - F.count_distinct(F.col(e.column)))
                .cast("long")
                .alias(e.name)
            )
        else:
            aggs.append(
                F.coalesce(F.sum(_violation_expr(e).cast("long")), F.lit(0))
                .cast("long")
                .alias(e.name)
            )
    wide = df.agg(*aggs)
    # one row per expectation via explode over the single agg row — a
    # per-expectation union would re-execute the aggregation once per
    # branch (the union-recompute tax, see verify notes)
    items = F.array(
        *[
            F.struct(
                F.lit(e.name).alias("expectation"),
                F.lit(e.column).alias("column"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(e.name).cast("long").alias("n_violations"),
            )
            for e in expectations
        ]
    )
    return (
        wide.select(F.explode(items).alias("x"))
        .select("x.*")
        .withColumn("passed", F.col("n_violations") == 0)
    )
