"""Near-duplicate detection for training-data curation: exact,
n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the point of each variant):

- **exact**: one shuffle on md5(text). Works at any scale.
- **ngram_jaccard_pairs**: exact all-pairs via inverted shingle index —
  the candidate join explodes with document frequency, so hot shingles
  are dropped (``max_df``) exactly like production near-dup pipelines;
  cost is Σ df² over kept shingles, NOT corpus².
- **minhash_lsh**: the 100 TB path. One pass computes k min-hashes per
  doc (explode shingles → k agg-min in a single groupBy), banding turns
  pair discovery into an equality join on (band, band_hash) — no
  quadratic step anywhere; candidates verified with exact Jaccard.
- **simhash**: 64-bit signature via per-token hash bit-voting; the
  pigeonhole banding (4×16-bit chunks) finds all pairs within hamming
  distance 3 with equality joins only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text_stats import shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest-id doc per identical text (hash
    groupBy — deterministic keep-first)."""
    h = F.md5(F.col(text_col))
    best = df.withColumn("_h", h).groupBy("_h").agg(F.min(id_col).alias(id_col))
    return df.join(best, id_col, "left_semi")


def _distinct_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return (
        df.select(id_col, F.explode(shingles(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 20,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted index.

    ``max_df`` drops shingles appearing in more than that many docs
    (they contribute candidate-pair blowup but little similarity
    signal). Returns (id_1, id_2, jaccard) with id_1 < id_2.
    """
    # One shingle pass, persisted: the set feeds both join sides and the
    # size table — without the persist Spark re-parses every document
    # three times. The join key is xxhash64(shingle) (8-byte shuffle
    # keys instead of ~20-byte strings; collision odds ~(N²/2⁶⁴) are
    # negligible against the 4dp-rounded Jaccard).
    sh = (
        _distinct_shingles(df, text_col, id_col, n)
        .select(id_col, F.xxhash64("shingle").alias("_sk"))
        .persist()
    )
    if max_df is not None:
        keep = sh.groupBy("_sk").count().filter(F.col("count") <= max_df).select("_sk")
        sh = sh.join(keep, "_sk", "left_semi").persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(id_col).alias("id_1"), "_sk")
    b = sh.select(F.col(id_col).alias("id_2"), "_sk")
    inter = (
        a.join(b, "_sk")
        .filter(F.col("id_1") < F.col("id_2"))
        .groupBy("id_1", "id_2")
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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """k MinHash values per doc in ONE pass: explode distinct shingles,
    hash each with k seeds (xxhash64 with a seed column), k agg-mins in
    a single groupBy. Output: (id, sig array<long>[k])."""
    sh = _distinct_shingles(df, text_col, id_col, n)
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"_h{i}")
            for i in range(num_hashes)
        ]
    )
    return mins.select(
        id_col, F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, optionally verified
    with exact Jaccard (no max_df cap — verification only runs on the
    candidate set, which banding already made near-linear).

    With k=64, b=16, r=4: P(candidate | J=0.5) ≈ 1-(1-0.5^4)^16 ≈ 0.65,
    ≈ 0.9998 at J=0.8 — tune bands up for lower thresholds.
    """
    r = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)
    banded = sig.select(
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
    sh = _distinct_shingles(df, text_col, id_col, n).persist()
    s1 = sh.select(F.col(id_col).alias("id_1"), "shingle")
    s2 = sh.select(F.col(id_col).alias("id_2"), "shingle")
    inter = (
        cand.join(s1, "id_1")
        .join(s2, ["id_2", "shingle"])
        .groupBy("id_1", "id_2")
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_1"), F.col("_n").alias("_n1")), "id_1")
        .join(sizes.select(F.col(id_col).alias("id_2"), F.col("_n").alias("_n2")), "id_2")
        .withColumn(
            "jaccard",
            F.round(F.col("_inter") / (F.col("_n1") + F.col("_n2") - F.col("_inter")), 4),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_1", "id_2", "jaccard")
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc: hash each distinct shingle, vote ±1 per
    bit position, sign of the vote sets the bit. One explode + one
    groupBy. (Shingles, not tokens: on a shared-vocabulary corpus the
    distinct-token set is near-identical across docs and SimHash would
    saturate; 3-gram shingles keep the signature discriminative.)"""
    tok = _distinct_shingles(df, text_col, id_col, 3).withColumnRenamed("shingle", "tok")
    h = F.xxhash64("tok")
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig + F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(id_col, sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs within hamming distance ``max_hamming`` of 64-bit SimHash.

    Pigeonhole banding: split into 4 × 16-bit chunks; any pair with
    distance ≤ 3 shares at least one identical chunk → equality join
    per chunk, then exact hamming verify via bit_count(xor)."""
    sig = simhash_signatures(df, text_col, id_col)
    chunks = sig.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * c)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"c{c}")
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(
        F.col(id_col).alias("id_1"), F.col("simhash").alias("_s1"), "chunk_idx", "chunk_val"
    )
    b = chunks.select(
        F.col(id_col).alias("id_2"), F.col("simhash").alias("_s2"), "chunk_idx", "chunk_val"
    )
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2", F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
