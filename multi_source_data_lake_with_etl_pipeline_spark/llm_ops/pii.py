"""PII detection and redaction for training-data curation.

A 100 TB pre-training corpus is scrubbed of emails / phone numbers /
IPs / card- and SSN-shaped strings before anything else happens to it.
Both operators here are single narrow JVM-side projections over the
text column — ``regexp_extract_all`` for counting, chained
``regexp_replace`` for redaction — so they run at full scan speed with
zero shuffles and zero Python workers, and compose with any downstream
dedup/quality pass in the same stage.

Pattern dialect: every regex is simultaneously valid Java
(``java.util.regex``) and RE2 (DuckDB / Go / Hyperscan-ish engines) —
no backreferences, no lookaround — so external engines can reproduce
the scrub bit-for-bit (the correctness oracle does exactly that).

Reference parity: the reference has no PII layer; this extends its
cleaning family (src/transformers/data_cleaner.py:1-80) with the
curation ops a training-data lake needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered dict: redaction applies in this order. Patterns are mutually
# non-overlapping on well-formed text (card = 4-4-4-4, ssn = 3-2-4,
# phone = 3-3-4 groups), but card runs before phone anyway so a card
# substring can never be half-eaten by a shorter match.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "credit_card": r"\b[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "phone": r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def _token(name: str) -> str:
    return f"<{name.upper()}>"


def pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add one ``pii_n_<type>`` long column per pattern plus a total.

    Counting uses the raw text for every pattern (not the progressively
    redacted text), so counts are independent of redaction order.
    """
    t = F.col(text_col)
    cols = {
        f"pii_n_{name}": F.size(F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    out = df.withColumns(cols)
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"pii_n_{name}")
        total = c if total is None else total + c
    return out.withColumn("pii_n_total", total)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    types: list[str] | None = None,
) -> DataFrame:
    """Replace every PII match with its ``<TYPE>`` token.

    One chained ``regexp_replace`` projection — Catalyst fuses the
    chain into a single whole-stage-codegen pass over the column.
    """
    expr: Column = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        if types is not None and name not in types:
            continue
        expr = F.regexp_replace(expr, pat, _token(name))
    return df.withColumn(out_col, expr)


def scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Counts + redaction in one projection (the usual curation step:
    keep the stats, ship the scrubbed text)."""
    return redact_pii(pii_counts(df, text_col), text_col)


def oracle_patterns() -> dict[str, str]:
    """The exact patterns, for building external-engine oracle SQL."""
    return dict(PII_PATTERNS)


def luhn_valid(digits: Column) -> Column:
    """True iff the digit string passes the Luhn checksum (ISO/IEC
    7812) — the validity layer a PII pipeline runs AFTER the card-shaped
    regex: most random 16-digit strings are regex hits but checksum
    misses, so Luhn cuts the false-positive rate of `credit_card`
    detections ~10x. Pure JVM HOF expression (char split → indexed
    transform doubling every second digit from the right, 9-fold, sum
    mod 10) — scan-speed, no UDF, reproducible in any engine with the
    same arithmetic."""
    # split("(?!^)") also matches the end-of-string position → one
    # trailing "" that ANSI cast would throw on; drop empties
    chars = F.reverse(F.filter(F.split(digits, "(?!^)"), lambda c: c != ""))
    d = lambda c: c.cast("int")  # noqa: E731
    vals = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(d(c) * 2 > 9, d(c) * 2 - 9).otherwise(d(c) * 2),
        ).otherwise(d(c)),
    )
    return F.aggregate(vals, F.lit(0), lambda a, x: a + x) % 10 == 0
