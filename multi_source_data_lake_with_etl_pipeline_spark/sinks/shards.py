"""Training-shard writer: the last hop of a curation pipeline.

Trainers consume fixed-count shard files with a manifest (row/token
counts per shard, plus an order-insensitive content fingerprint) so
data loading can be sharded across workers and verified before a run.
This writer produces exactly that from any DataFrame:

- shard assignment = ``pmod(xxhash64(key), n_shards)`` — deterministic
  per ROW (not per partition), so the same corpus always lands in the
  same shards regardless of source partitioning or cluster layout, and
  a re-run after a failure overwrites byte-compatible content;
- one hash-partitioned exchange writes all shards in parallel
  (``repartition(n, col)`` → each output task owns one shard file);
- the manifest is aggregated in the SAME job's shape (one groupBy over
  the assignment column — map-side combined, n_shards rows) and
  includes a per-shard xor-of-row-hashes fingerprint: order-insensitive,
  so any engine can re-derive and audit it.

Reference parity: extends L6/L7 (file writer / multi-target) with the
sharded-output contract the reference lacks.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_id(key_col: str, n_shards: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)).cast("int")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    token_col: str | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` parquet shard directories plus a
    ``manifest.json``. Returns the manifest dict:
    {shards: [{shard, rows, tokens?, fingerprint}], total_rows}."""
    tagged = df.withColumn("_shard", shard_id(key_col, n_shards))
    # order-insensitive content fingerprint: xor of per-row xxhash64
    # over the concatenated row repr (bit_xor is commutative, so the
    # fingerprint is independent of row order and partitioning)
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    aggs = [F.count(F.lit(1)).alias("rows"), F.expr("bit_xor(_rh)").alias("fingerprint")]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("tokens"))
    stats = (
        tagged.withColumn("_rh", row_hash)
        .groupBy("_shard")
        .agg(*aggs)
        .collect()
    )
    (
        tagged.repartition(n_shards, F.col("_shard"))
        .write.mode("overwrite")
        .partitionBy("_shard")
        .parquet(path)
    )
    shards = sorted(
        (
            {
                "shard": int(r["_shard"]),
                "rows": int(r["rows"]),
                "fingerprint": int(r["fingerprint"]),
                **({"tokens": int(r["tokens"])} if token_col else {}),
            }
            for r in stats
        ),
        key=lambda s: s["shard"],
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def verify_shards(spark, path: str) -> dict:
    """Re-derive per-shard rows + fingerprint from the written files
    and compare to the manifest. Returns {ok, mismatches}."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.parquet(path)
    data_cols = [c for c in df.columns if c != "_shard"]
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in data_cols])
    got = {
        int(r["_shard"]): (int(r["rows"]), int(r["fp"]))
        for r in df.withColumn("_rh", row_hash)
        .groupBy("_shard")
        .agg(F.count(F.lit(1)).alias("rows"), F.expr("bit_xor(_rh)").alias("fp"))
        .collect()
    }
    mismatches = [
        s["shard"]
        for s in manifest["shards"]
        if got.get(s["shard"]) != (s["rows"], s["fingerprint"])
    ]
    return {"ok": not mismatches, "mismatches": mismatches}
