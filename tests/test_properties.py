"""Property-based tests (hypothesis) for the scalar function library —
the randomized coverage the reference never had (SURVEY.md §5.1:
faker/great-expectations in requirements, never imported).

Each property runs a batch of generated values through the Spark
expression ONCE (single createDataFrame + collect per property, not
per example) and checks the invariant in Python.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.functions.scalar import (
    detect_semantic_type,
    md5_record_hash,
    normalize_phone,
    sanitize_string,
    to_number,
)


def run_column(spark, values, expr_builder):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["out"] for r in df.select(expr_builder(F.col("v")).alias("out")).collect()]


# One digit-string per length class, plus arbitrary formatting noise.
phone_texts = st.text(
    alphabet="0123456789 ()-.+abcxyz", min_size=0, max_size=20
)


@settings(max_examples=30, deadline=None)
@given(st.lists(phone_texts, min_size=1, max_size=50))
def test_normalize_phone_properties(spark, vals):
    outs = run_column(spark, vals, normalize_phone)
    for v, out in zip(vals, outs):
        digits = re.sub(r"[^0-9]", "", v)
        if len(digits) == 10:
            assert out == f"({digits[0:3]}) {digits[3:6]}-{digits[6:10]}"
        elif len(digits) == 11 and digits.startswith("1"):
            assert out == f"+1 ({digits[1:4]}) {digits[4:7]}-{digits[7:11]}"
        else:  # passthrough unchanged (data_transformers.py:82-83)
            assert out == v


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(-(10**12), 10**12).map(str),
            st.floats(
                allow_nan=False, allow_infinity=False, width=32
            ).map(lambda f: f"{f:.6f}"),
            st.text(alphabet="abc .-", max_size=8),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_to_number_properties(spark, vals):
    outs = run_column(spark, vals, to_number)
    for v, out in zip(vals, outs):
        t = v.strip()
        if re.fullmatch(r"-?\d+", t):
            assert out == float(int(t))
        elif re.fullmatch(r"-?\d*\.\d+", t):
            assert abs(out - float(t)) < 1e-6 * max(1.0, abs(float(t)))
        else:
            assert out is None


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(max_size=30), min_size=1, max_size=50))
def test_sanitize_strips_control_chars(spark, vals):
    outs = run_column(spark, vals, sanitize_string)
    for out in outs:
        if out is not None:
            assert not any(ord(ch) < 32 for ch in out)
            assert out == out.strip()


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii"), max_size=25), min_size=1, max_size=40))
def test_detect_semantic_type_total(spark, vals):
    # Totality: every value classifies to exactly one known type label.
    outs = run_column(spark, vals, detect_semantic_type)
    labels = {"null", "boolean", "integer", "float", "email", "phone", "date", "url", "string"}
    assert all(o in labels for o in outs)


def test_record_hash_stability_and_sensitivity(spark):
    df = spark.createDataFrame(
        [("a@x.com", "555", "Jo"), ("a@x.com", "555", "Jo"), ("b@x.com", "555", "Jo")],
        "email string, phone string, name string",
    )
    hashes = [
        r["h"]
        for r in df.select(
            md5_record_hash("email", "name", "phone").alias("h")
        ).collect()
    ]
    assert hashes[0] == hashes[1]  # equal records ⇒ equal hash
    assert hashes[0] != hashes[2]  # any field change ⇒ different hash


def test_salted_join_matches_plain_join(spark):
    from multi_source_data_lake_with_etl_pipeline_spark.operators.joins import salted_join

    fact = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    # Heavy skew: 80% of rows on one key.
    fact = fact.withColumn(
        "k", F.when(F.col("v") % 5 != 0, F.lit(3)).otherwise(F.col("k"))
    )
    dim = spark.range(0, 7).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), "id").alias("label")
    )
    plain = fact.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(fact, dim, "k").groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


# --- curation ops -----------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"), max_size=60),
        min_size=1,
        max_size=40,
    )
)
def test_pii_redaction_idempotent_and_total_consistent(spark, vals):
    """Redacting twice == redacting once (tokens contain no PII shapes),
    and pii_n_total always equals the sum of the per-type counts."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops import pii

    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "doc_id int, text string")
    once = pii.scrub(df)
    twice = pii.redact_pii(once, text_col="text_redacted", out_col="re2")
    for r in twice.collect():
        assert r.re2 == r.text_redacted
        total = sum(r[f"pii_n_{t}"] for t in pii.PII_PATTERNS)
        assert r.pii_n_total == total


@settings(max_examples=20, deadline=None)
@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
def test_fraction_threshold_monotone(spark, f):
    """Thresholds order like their fractions, and endpoints are exact —
    monotonicity is what makes nested samples (0.01 ⊂ 0.1 ⊂ 1.0) true."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
        fraction_threshold,
    )

    t = fraction_threshold(f)
    assert fraction_threshold(0.0) <= t <= fraction_threshold(1.0)
    for g in (0.0, 0.25, 0.5, 0.75, 1.0):
        if f <= g:
            assert t <= fraction_threshold(g)


@settings(max_examples=10, deadline=None)
@given(st.integers(min_value=1, max_value=3))
def test_nested_samples_are_subsets(spark, seed):
    """A smaller deterministic sample is a strict subset of a larger one
    with the same salt (hex-prefix predicate is threshold-monotone)."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.sampling import (
        sample_fraction,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    salt = f"s{seed}"
    small = {r.k for r in sample_fraction(df, "k", 0.05, salt).collect()}
    big = {r.k for r in sample_fraction(df, "k", 0.3, salt).collect()}
    assert small <= big


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab "), max_size=30),
        min_size=1,
        max_size=30,
    )
)
def test_repetition_bounds(spark, texts):
    """0 ≤ ratio/top-share ≤ 10000; distinct ≤ total; zero-gram docs
    report all-zero."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import (
        repetition_stats,
    )

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    for r in repetition_stats(df).collect():
        assert 0 <= r.rep_ratio_bp <= 10000
        assert 0 <= r.rep_top_share_bp <= 10000
        assert r.rep_distinct_ngrams <= r.rep_total_ngrams
        if r.rep_total_ngrams == 0:
            assert r.rep_ratio_bp == 0 and r.rep_top_share_bp == 0


def test_fuzzy_neighborhood_randomized_vs_block(spark):
    """Randomized cross-check: deletion-neighborhood candidates (k=1
    and k=2) must reproduce the exhaustive blocked join on a corpus of
    random strings with planted random edits (substitute / insert /
    delete chains), including cross-block isolation."""
    import random

    from multi_source_data_lake_with_etl_pipeline_spark.operators.joins import fuzzy_join

    rng = random.Random(42)
    alphabet = "abcdefg"

    def mutate(s: str) -> str:
        ops = ["sub", "ins", "del"] if s else ["ins"]
        op = rng.choice(ops)
        i = rng.randrange(len(s) + (op == "ins"))
        if op == "sub":
            return s[:i] + rng.choice(alphabet) + s[i + 1 :]
        if op == "ins":
            return s[:i] + rng.choice(alphabet) + s[i:]
        return s[:i] + s[i + 1 :]

    names = []
    for b in range(3):  # three blocks
        for _ in range(12):
            s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 10)))
            names.append((s, f"blk{b}"))
            m = s
            for _ in range(rng.randrange(0, 3)):  # 0-2 planted edits
                m = mutate(m)
            names.append((m, f"blk{b}"))

    a = spark.createDataFrame(
        [(i, s, blk) for i, (s, blk) in enumerate(names)],
        "id_1 long, n1 string, blk string",
    )
    b = spark.createDataFrame(
        [(100 + i, s, blk) for i, (s, blk) in enumerate(names)],
        "id_2 long, n2 string, blk string",
    )
    for k in (1, 2):
        fast = {
            (r.id_1, r.id_2, r.edit_dist)
            for r in fuzzy_join(
                a, b, "blk", "n1", "n2", max_dist=k, method="neighborhood"
            ).collect()
        }
        exhaustive = {
            (r.id_1, r.id_2, r.edit_dist)
            for r in fuzzy_join(
                a, b, "blk", "n1", "n2", max_dist=k, method="block"
            ).collect()
        }
        assert fast == exhaustive, f"k={k} mismatch"
        assert fast  # planted edits guarantee matches


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=60,
        unique=True,
    )
)
def test_morton_injective_and_axis_monotone(spark, pairs):
    """Distinct (a,b) pairs -> distinct z (bit interleaving is a
    bijection), and z is strictly increasing in each dimension with
    the other held fixed (spread_bits is order-preserving)."""
    from multi_source_data_lake_with_etl_pipeline_spark.operators.zorder import morton2

    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select("a", "b", morton2(F.col("a"), F.col("b")).alias("z")).collect()
    zs = {(r["a"], r["b"]): r["z"] for r in rows}
    assert len(set(zs.values())) == len(pairs)
    # reference interleave in Python
    def ref(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in zs.items():
        assert z == ref(a, b)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=0,
        max_size=40,
    )
)
def test_triangle_count_matches_bruteforce(spark, edges):
    from itertools import combinations

    from multi_source_data_lake_with_etl_pipeline_spark.operators.graph import (
        triangle_count,
    )

    simple = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    if not simple:
        return  # empty graph: nothing to count
    nodes = {x for e in simple for x in e}
    expect = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in simple and (b, c) in simple and (a, c) in simple
    )
    df = spark.createDataFrame(list(edges), "src long, dst long") if edges else None
    r = triangle_count(df).collect()[0]
    assert r["n_triangles"] == expect
    assert r["n_edges"] == len(simple)
    assert r["n_nodes"] == len(nodes)


@settings(max_examples=15, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=3),
        max_size=25,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=3),
        max_size=25,
    ),
)
def test_snapshot_diff_partitions_key_universe(spark, old_map, new_map):
    from multi_source_data_lake_with_etl_pipeline_spark.operators.diff import (
        snapshot_diff,
    )

    if not old_map and not new_map:
        return
    old = spark.createDataFrame(list(old_map.items()) or [(None, None)], "k long, v long").filter("k IS NOT NULL")
    new = spark.createDataFrame(list(new_map.items()) or [(None, None)], "k long, v long").filter("k IS NOT NULL")
    got = {r["k"]: r["diff_status"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert set(got) == set(old_map) | set(new_map)
    for k, s in got.items():
        if k in old_map and k not in new_map:
            assert s == "removed"
        elif k not in old_map and k in new_map:
            assert s == "added"
        elif old_map[k] == new_map[k]:
            assert s == "unchanged"
        else:
            assert s == "changed"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # group
            st.integers(min_value=-50, max_value=50),  # value quarters
        ),
        min_size=1,
        max_size=120,
    ),
    st.lists(
        st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
        min_size=1,
        max_size=3,
    ),
)
def test_exact_percentiles_property_vs_percentile(spark, rows, ps):
    """Property: exact_percentiles ≡ Spark's exact percentile aggregate
    for ANY group layout (heavy ties by construction — values are
    quarter-integers), any p in [0,1], every group size ≥ 1."""
    from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import (
        exact_percentiles,
    )

    df = spark.createDataFrame(
        [(f"g{g}", v / 4.0) for g, v in rows], "g string, v double"
    )
    named = {f"p{i}": p for i, p in enumerate(ps)}
    got = {
        r["g"]: tuple(r[n] for n in named)
        for r in exact_percentiles(df, ["g"], "v", named).collect()
    }
    want = {
        r["g"]: tuple(r[n] for n in named)
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", F.lit(p)).alias(n) for n, p in named.items()])
        .collect()
    }
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.dictionaries(
            st.from_regex(r"[A-Za-z_][A-Za-z0-9_.-]{0,10}", fullmatch=True),
            st.one_of(
                st.none(),
                st.booleans(),
                st.integers(min_value=-(10**12), max_value=10**12),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.text(max_size=40),
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=0,
        max_size=8,
    )
)
def test_yamlite_roundtrip_property(rows):
    """Property: the flat-subset YAML codec round-trips ANY flat
    mapping of scalars — including control characters, quotes,
    colons, YAML-looking strings ('true', '- x', '---'), and floats —
    byte-exactly through dump+parse."""
    from multi_source_data_lake_with_etl_pipeline_spark.sources import yamlite

    assert yamlite.parse(yamlite.dump_rows(rows)) == rows


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="0123456789", min_size=1, max_size=24))
def test_luhn_exactly_one_check_digit(spark, digits):
    """Luhn invariant: for ANY digit string there is EXACTLY ONE check
    digit d in 0..9 making digits+d pass — the property that makes the
    checksum a usable validity layer (a random final digit passes with
    p=0.1, never more, never less)."""
    from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.pii import luhn_valid

    df = spark.createDataFrame(
        [(digits + str(d),) for d in range(10)], "pan string"
    )
    n_valid = df.select(
        F.sum(luhn_valid(F.col("pan")).cast("long")).alias("n")
    ).collect()[0]["n"]
    assert n_valid == 1
