"""Hashed-feature linear model inference as a scan-speed expression.

The last mile of a curation pipeline is usually a learned quality /
safety / domain classifier applied to every document. For linear
models over hashed bag-of-words features (the fastText-style workhorse
at corpus scale), inference needs no ML runtime at all: score =
Σ_tokens W[h(token) mod D]. This module compiles that dot product into
a pure JVM column expression — the weight vector rides along as a
literal array, the token loop is an array fold, and the whole thing is
a narrow map evaluated inside whole-stage codegen: classifier
inference at full scan speed, zero shuffles, zero UDFs, zero Python
workers. At 100 TB the classifier pass costs exactly one read.

Cross-engine exactness (for the oracle harness): the feature hash is
two hex digits of md5 (portable: every engine renders md5 as lowercase
hex, and digit→value is a strpos lookup), weights are INTEGERS (the
margin is an exact integer sum — no float summation-order drift), and
the normalized score is integer basis points via floor division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import words

_HEX = "0123456789abcdef"
_D = 256  # feature buckets: 2 hex digits of md5


def feature_bucket(token: Column) -> Column:
    """Portable hash bucket in [0, 256): numeric value of the first two
    hex digits of md5(token). Engines without base conversion reproduce
    it with per-digit alphabet-position arithmetic (strpos) — see the
    ``hashed_linear_score`` oracle."""
    return F.conv(F.substring(F.md5(token), 1, 2), 16, 10).cast("int")


def demo_weights(d: int = _D) -> list[int]:
    """Deterministic integer weight vector (stand-in for trained
    weights; a real model drops its quantized weights in unchanged):
    w[b] = ((b * 2654435761) % 2001) - 1000 ∈ [-1000, 1000]."""
    return [((b * 2654435761) % 2001) - 1000 for b in range(d)]


def hashed_linear_margin(
    df: DataFrame,
    weights: list[int] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Adds ``margin`` (exact integer Σ W[bucket(token)]) and
    ``score_bp`` (floor(margin * 10000 / n_tokens), 0 tokens → 0):
    the per-length-normalized classifier margin in basis points.

    One chained expression: tokenize → per-token bucket → literal-array
    weight lookup → integer fold. No joins — the weight table is part
    of the compiled plan (W is D small ints; for D beyond literal-array
    comfort, broadcast-join a (bucket, weight) table instead, same
    per-row cost)."""
    w = weights if weights is not None else demo_weights()
    lut = F.array(*[F.lit(int(x)) for x in w])
    toks = words(F.col(text_col))
    margin = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.element_at(lut, feature_bucket(t) + 1),
    )
    n = F.size(toks)
    out = df.withColumn("margin", margin)
    return out.withColumn(
        "score_bp",
        F.when(n > 0, F.floor(F.col("margin") * 10000 / n)).otherwise(F.lit(0)).cast("long"),
    )
