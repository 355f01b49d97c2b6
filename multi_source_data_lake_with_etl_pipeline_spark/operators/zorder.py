"""Z-order (Morton) multi-dimensional clustering for lake layout.

Beyond-reference capability: the reference lake writes files in arrival
order (base_loaders.py), so a query filtering on two columns reads
every file. Z-ordering interleaves the bits of several quantized sort
keys into one clustering key; range-partitioning + sorting by it gives
every dimension locality at once, so the lake's per-file min/max stats
(lake.py `_file_stats` / `read_pruned`) prune multi-column predicates
instead of just the primary sort key — the same trick Delta/Iceberg
OPTIMIZE ZORDER applies at 100 TB.

Everything here is exact 64-bit integer arithmetic on JVM-side
expressions (shifts/masks fold into whole-stage codegen): quantize each
dimension to ``bits`` buckets between explicit bounds, spread the bits,
OR them interleaved. No UDFs, no doubles — the z-value is engine-exact
and therefore oracle-able.

Relationship to ``sinks/maintenance.zorder_value`` (the generic n-dim
bit-loop wired into ``LakeTable.compact(cluster_by=[...])``): for two
dimensions the two produce THE SAME integer (col 0 on even bits, col 1
on odd — equivalence pinned in tests/test_operators.py); this module is
the 2-D fast path (4 magic-mask ops per dim instead of a 16-term bit
loop) with explicit bounds so no statistics scan precedes the write,
and shift-only quantization so an external engine can replay the key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) steps spreading a 16-bit int so a second dimension can
# interleave into the odd bits: x{16} -> 0x0y0y... pattern. Classic
# Morton magic numbers, 2-D / 16-bit-per-dim variant (z fits in 32
# bits; masks kept as Python ints, emitted as long literals).
_SPREAD_2D = [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]


def quantize(col: Column, lo: int, hi: int, bits: int = 16) -> Column:
    """Clamp an integer expression to [lo, hi] and map it to
    [0, 2^bits) by taking the top ``bits`` bits of the offset within
    the next power-of-two span — shift-only (no division whose
    double-rounding could diverge between engines), engine-exact."""
    span = int(hi) - int(lo)
    width = max(span.bit_length(), bits)  # pow2 span >= actual span
    shift = width - bits
    c = F.greatest(F.lit(int(lo)), F.least(F.lit(int(hi)), col.cast("long")))
    q = c - F.lit(int(lo))
    return F.shiftright(q, shift) if shift else q


def spread_bits(col: Column) -> Column:
    """Insert a zero bit above every bit of a 16-bit value (x -> bits
    at even positions of a 32-bit value)."""
    x = col
    for shift, mask in _SPREAD_2D:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(col_a: Column, col_b: Column) -> Column:
    """Interleave two 16-bit quantized values: a in even bits, b in odd
    bits of a 32-bit z-value."""
    return spread_bits(col_a).bitwiseOR(F.shiftleft(spread_bits(col_b), 1))


def zorder_key(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    bits: int = 16,
    out: str = "z",
) -> DataFrame:
    """Add a z-order clustering key over two integer columns.
    ``specs`` = [(col, lo, hi), (col, lo, hi)] — explicit bounds, so the
    key needs NO global statistics pass (at 100 TB the bounds come from
    table metadata, not a scan)."""
    if len(specs) != 2:
        raise ValueError("zorder_key interleaves exactly 2 dimensions")
    if bits > 16:
        # the magic masks in _SPREAD_2D are 16-bit-per-dim; wider inputs
        # would silently scramble high bits into colliding z-values
        raise ValueError("zorder_key supports at most 16 bits per dimension")
    qa = quantize(F.col(specs[0][0]), specs[0][1], specs[0][2], bits)
    qb = quantize(F.col(specs[1][0]), specs[1][1], specs[1][2], bits)
    return df.withColumn(out, morton2(qa, qb))


def zorder_repartition(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    num_files: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster a DataFrame for writing: range-partition by the z-key
    (one exchange, AQE-balanced) and sort within partitions so parquet
    row-group stats are tight on BOTH dimensions. Drop-in layout step
    before ``LakeTable.create``/``overwrite``."""
    z = zorder_key(df, specs, bits)
    return z.repartitionByRange(num_files, "z").sortWithinPartitions("z").drop("z")


def zbucket_profile(
    df: DataFrame,
    specs: list[tuple[str, int, int]],
    bucket_bits: int = 4,
    bits: int = 16,
) -> DataFrame:
    """Locality audit: split the z-range into 2^bucket_bits fixed
    buckets (top bits of z — shuffle-free, no global sort) and profile
    each bucket's per-dimension min/max span. Tight spans on BOTH
    columns are the file-skipping guarantee z-ordering buys."""
    a, b = specs[0][0], specs[1][0]
    z = zorder_key(df, specs, bits)
    bucket = F.shiftright(F.col("z"), 2 * bits - bucket_bits)
    return (
        z.groupBy(bucket.alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(a).cast("long").alias(f"min_{a}"),
            F.max(a).cast("long").alias(f"max_{a}"),
            F.min(b).cast("long").alias(f"min_{b}"),
            F.max(b).cast("long").alias(f"max_{b}"),
        )
        .orderBy("z_bucket")
    )
