"""Scalar functions re-expressing the reference's per-record Python
(SURVEY.md §2.8) as native Spark column expressions.

Reference citations per function are inline. Everything here is a
``Column -> Column`` builder; compose freely inside select/withColumns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F7: email regex — exact pattern from data_transformers.py:139,
# data_validators.py:131, common_utils.py:56.
EMAIL_RE = r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$"

# F17: URL detector — common_utils.py:89-97.
URL_RE = r"^https?://[^\s/$.?#].[^\s]*$"

# F10: the reference's strptime fallback chain (common_utils.py:277-281).
DATE_FORMATS = [
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd/MM/yyyy",
    "yyyy/MM/dd",
    "MM-dd-yyyy",
]


def is_email(c: Column) -> Column:
    """F7/F16 semantic type: email (common_utils.py:54-59)."""
    return c.rlike(EMAIL_RE)


def is_phone(c: Column) -> Column:
    """F17: 10-15 digits after stripping formatting (common_utils.py:62-67)."""
    digits = F.regexp_replace(c, r"[^0-9]", "")
    return F.length(digits).between(10, 15)


def is_url(c: Column) -> Column:
    """F17: http(s) URL (common_utils.py:87-97)."""
    return c.rlike(URL_RE)


def normalize_phone(c: Column) -> Column:
    """F4: phone normalization (data_transformers.py:72-83).

    digits-only; 10 digits → ``(AAA) BBB-CCCC``; 11 digits with leading
    1 → ``+1 (AAA) BBB-CCCC``; anything else passes through unchanged.
    """
    digits = F.regexp_replace(c, r"[^0-9]", "")
    ten = F.concat(
        F.lit("("),
        F.substring(digits, 1, 3),
        F.lit(") "),
        F.substring(digits, 4, 3),
        F.lit("-"),
        F.substring(digits, 7, 4),
    )
    eleven = F.concat(
        F.lit("+1 ("),
        F.substring(digits, 2, 3),
        F.lit(") "),
        F.substring(digits, 5, 3),
        F.lit("-"),
        F.substring(digits, 8, 4),
    )
    return (
        F.when(F.length(digits) == 10, ten)
        .when((F.length(digits) == 11) & digits.startswith("1"), eleven)
        .otherwise(c)
    )


def to_number(c: Column) -> Column:
    """F5: numeric-string coercion (data_transformers.py:58-62, 85-91):
    integer-looking → long, decimal-looking → double, else null.
    Returns a double column (supertype) so int/float branches unify."""
    trimmed = F.trim(c)
    return (
        F.when(trimmed.rlike(r"^-?\d+$"), trimmed.cast("long").cast("double"))
        .when(trimmed.rlike(r"^-?\d*\.\d+$"), trimmed.cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )


def title_case(c: Column) -> Column:
    """F3: ``str.title()`` for status/country/state fields
    (data_transformers.py:50-51)."""
    return F.initcap(c)


def sanitize_string(c: Column) -> Column:
    """F14: drop control chars (ord < 32) + strip (common_utils.py:417-428).

    The reference strips with Python ``str.strip()``, which is
    Unicode-aware; ``F.trim`` only removes ASCII spaces, so the strip
    is a Unicode-whitespace regex for parity."""
    return F.regexp_replace(
        F.regexp_replace(c, r"[\x00-\x1F]", ""),
        r"^\p{IsWhite_Space}+|\p{IsWhite_Space}+$",
        "",
    )


def parse_date_multi(c: Column) -> Column:
    """F10: multi-format date parse (common_utils.py:274-293) — the
    strptime fallback chain as one ``coalesce`` of ``try_to_timestamp``."""
    attempts = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in DATE_FORMATS]
    # ISO with Z → +00:00 handled by replacing Z (common_utils.py:291).
    attempts.append(F.try_to_timestamp(F.regexp_replace(c, "Z$", "+00:00")))
    return F.coalesce(*attempts)


def age_years(birth: Column, as_of: Column | None = None) -> Column:
    """F9: age from birth date, floor((now - birth).days / 365)
    (data_transformers.py:164-171). ``as_of`` defaults to current_date;
    pass a literal for deterministic tests."""
    ref = as_of if as_of is not None else F.current_date()
    return F.floor(F.datediff(ref, F.to_date(birth)) / 365).cast("long")


def postal_code(address: Column) -> Column:
    """F8: first ``\\b\\d{5}(-\\d{4})?\\b`` in an address string
    (data_transformers.py:174-179); empty string when absent."""
    return F.regexp_extract(address, r"\b(\d{5}(?:-\d{4})?)\b", 1)


def time_ago(ts: Column, now: Column | None = None) -> Column:
    """F12: humanized elapsed time (common_utils.py:317-331)."""
    ref = now if now is not None else F.current_timestamp()
    secs = F.unix_timestamp(ref) - F.unix_timestamp(ts)
    return (
        F.when(secs < 60, F.concat(secs.cast("long").cast("string"), F.lit(" seconds ago")))
        .when(secs < 3600, F.concat((secs / 60).cast("long").cast("string"), F.lit(" minutes ago")))
        .when(secs < 86400, F.concat((secs / 3600).cast("long").cast("string"), F.lit(" hours ago")))
        .otherwise(F.concat((secs / 86400).cast("long").cast("string"), F.lit(" days ago")))
    )


def md5_record_hash(*cols: Column | str) -> Column:
    """D1/F13: stable md5 record hash (common_utils.py:177-186).

    The reference hashes sorted-key JSON with ``default=str``; the
    Spark-native equivalent concatenates the values of the *caller-
    sorted* columns (pass them alphabetically for parity) — semantics
    (equal records ⇒ equal hash) are identical, byte-level md5 differs
    from Python json rendering (documented deviation, SURVEY.md §7.3).
    Nulls render as the sentinel ``\\x00null`` so (null, 'x') and
    ('null', 'x') collide neither with each other nor with ('nullx',).
    """
    parts = [
        F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"),
                   F.lit("\x00null"))
        for c in cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def is_valid_json(c: Column) -> Column:
    """F15: JSON validity probe (common_utils.py:408-414)."""
    return F.try_parse_json(c).isNotNull()


def json_envelope_unwrap(c: Column) -> Column:
    """F20: REST envelope unwrap — ``data``/``results``/``items`` keys
    (base_extractors.py:255-262) over a JSON string column; returns the
    first present array as a JSON string (caller explodes)."""
    return F.coalesce(
        F.get_json_object(c, "$.data"),
        F.get_json_object(c, "$.results"),
        F.get_json_object(c, "$.items"),
        c,
    )


def detect_semantic_type(c: Column) -> Column:
    """F16: per-value type detection incl. semantic string types
    (common_utils.py:24-52): null/boolean/integer/float/email/phone/
    date/url/string. Input is a string column (the reference inspects
    arbitrary values; on a typed table use ``typeof`` instead)."""
    trimmed = F.trim(c)
    return (
        F.when(c.isNull(), F.lit("null"))
        .when(F.lower(trimmed).isin("true", "false"), F.lit("boolean"))
        .when(trimmed.rlike(r"^-?\d+$"), F.lit("integer"))
        .when(trimmed.rlike(r"^-?\d*\.\d+$"), F.lit("float"))
        .when(is_email(trimmed), F.lit("email"))
        .when(is_phone(trimmed) & trimmed.rlike(r"^[\d\s\-\(\)\+\.]+$"), F.lit("phone"))
        .when(parse_date_multi(trimmed).isNotNull(), F.lit("date"))
        .when(is_url(trimmed), F.lit("url"))
        .otherwise(F.lit("string"))
    )
