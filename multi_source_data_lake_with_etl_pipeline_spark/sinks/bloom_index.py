"""Per-file Bloom-filter index for lake point lookups.

Footer min/max stats (``lake.py`` file skipping, Z-order clustering)
prune RANGE predicates, but an equality probe on a high-cardinality,
unclustered column (order id, user id, document hash) overlaps every
file's [min, max] and prunes nothing. The standard lake answer (Delta
/ Iceberg do the same) is a per-file Bloom filter: a one-time indexing
pass records, for each data file, the k hashed bit positions of every
value in the column; a point lookup then touches only files whose
filter *might* contain the probe (no false negatives — Bloom
guarantees the file list is a superset of the true one).

Design notes:

- The index build is ONE aggregation keyed by file: k positions per
  row (``pmod(xxhash64(col, seed), bits)``) explode into (file, pos)
  pairs, ``collect_set`` partial-aggregates map-side, so the shuffle
  carries at most ``bits`` distinct positions per file regardless of
  row count. At 100 TB this is a single linear pass — the amortized
  artifact that turns needle-in-haystack lookups from full scans into
  1-2 file reads.
- Positions are stored SPARSE (sorted int array per file, ≤ ``bits``
  entries) in a parquet sidecar under ``<table>/_index`` — no custom
  bitset codec, and the driver-side probe is a subset check.
- Probe hashing runs through a 1-row Spark plan, so probe and build
  use the IDENTICAL JVM xxhash64 — no Python reimplementation to
  drift.
- Staleness is versioned, not forbidden: the sidecar records the table
  version it indexed; ``point_read`` conservatively ADDS any file from
  a later commit and drops indexed files no longer active, so reads
  stay exact after appends/merges/compactions without rebuilding.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INDEX_DIR = "_index"
_DATA_PREFIX = "data/"


def _index_path(table_path: str, col: str) -> str:
    return os.path.join(table_path, _INDEX_DIR, f"bloom_{col}")


def _rel_data_path(abs_uri: str) -> str | None:
    """input_file_name() URI → the table-relative 'data/<file>' path."""
    marker = "/" + _DATA_PREFIX
    if marker not in abs_uri:
        return None
    return _DATA_PREFIX + abs_uri.rsplit(marker, 1)[1]


def build_bloom_index(table, col: str, bits: int = 8192, hashes: int = 4) -> str:
    """Index ``col`` of a ``lake.LakeTable``: one pass over the active
    snapshot, one (file, position) aggregation, sidecar written under
    the table. Returns the index directory path. NULLs are not indexed
    (equality with NULL never matches)."""
    version = table.latest_version()
    df = (
        table.read(version)
        .select(F.col(col))
        .withColumn("_f", F.input_file_name())
        .filter(F.col(col).isNotNull())
    )
    pos = F.explode(
        F.array(
            *[F.pmod(F.xxhash64(F.col(col), F.lit(s)), F.lit(bits)) for s in range(hashes)]
        )
    ).alias("_p")
    idx = (
        df.select("_f", pos)
        .groupBy("_f")
        .agg(F.sort_array(F.collect_set("_p")).alias("positions"))
    )
    out = _index_path(table.path, col)
    idx.write.mode("overwrite").parquet(out)
    with open(os.path.join(out, "_bloom_meta.json"), "w") as fh:
        json.dump(
            {"column": col, "bits": bits, "hashes": hashes, "version": version}, fh
        )
    return out


def _probe_positions(
    spark: SparkSession, value, dtype, bits: int, hashes: int
) -> list[int]:
    """Bit positions of ``value`` — computed with the same JVM xxhash64
    expression the build used (1-row plan, no Python hash drift). The
    literal is CAST to the indexed column's type first: xxhash64 hashes
    the physical representation, so int-literal 33 and bigint-column 33
    hash differently."""
    lit = F.lit(value).cast(dtype)
    row = spark.range(1).select(
        *[
            F.pmod(F.xxhash64(lit, F.lit(s)), F.lit(bits)).alias(f"p{s}")
            for s in range(hashes)
        ]
    ).collect()[0]
    return [row[f"p{s}"] for s in range(hashes)]


def bloom_prune_files(table, col: str, value) -> list[str]:
    """Table-relative active data files that MIGHT contain
    ``col = value``: indexed files pass the Bloom subset check;
    files committed after the index version are kept conservatively."""
    spark = table.spark
    out_dir = _index_path(table.path, col)
    with open(os.path.join(out_dir, "_bloom_meta.json")) as fh:
        meta = json.load(fh)
    _, _, schema = table._snapshot()
    probe = set(
        _probe_positions(spark, value, schema[col].dataType, meta["bits"], meta["hashes"])
    )
    indexed: dict[str, set[int]] = {}
    for r in spark.read.parquet(out_dir).collect():
        rel = _rel_data_path(r["_f"])
        if rel is not None:
            indexed[rel] = set(r["positions"])
    _, active, _ = table._snapshot()
    keep = []
    for a in active:
        p = a["path"]
        pos = indexed.get(p)
        if pos is None:  # newer than the index — cannot rule out
            keep.append(p)
        elif probe <= pos:
            keep.append(p)
    return keep


def point_read(table, col: str, value) -> DataFrame:
    """Equality lookup using the Bloom index: read only candidate
    files, then the exact residual filter. Same rows as
    ``table.read().filter(col == value)`` — the index only prunes."""
    _, _, schema = table._snapshot()
    paths = [table._abs(p) for p in bloom_prune_files(table, col, value)]
    if not paths:
        return table.spark.createDataFrame([], schema)
    return (
        table.spark.read.schema(schema).parquet(*paths).filter(F.col(col) == F.lit(value))
    )
