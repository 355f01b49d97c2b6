"""Scalar column-expression library (SURVEY.md §2.8 F1-F20).

All JVM-side ``pyspark.sql.functions`` compositions — no Python UDFs in
any hot path, so every expression stays inside whole-stage codegen.
"""

from .scalar import (  # noqa: F401
    EMAIL_RE,
    URL_RE,
    age_years,
    detect_semantic_type,
    is_email,
    is_phone,
    is_url,
    is_valid_json,
    json_envelope_unwrap,
    md5_record_hash,
    normalize_phone,
    parse_date_multi,
    postal_code,
    sanitize_string,
    time_ago,
    title_case,
    to_number,
)
