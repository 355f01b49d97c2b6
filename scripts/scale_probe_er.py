"""ER/fuzzy-family scale probe (VERDICT r3 #8): measure
fuzzy_join(method="neighborhood") and sorted_neighborhood_pairs at
5k vs 200k rows (40x), including the adversarial single-hot-block
case that degenerates hash blocking to block^2.

Synthetic corpus (seeded, driver-generated — the probe measures the
JOIN, not parquet scan): distinct random names; 10% of rows get a
1-char-deletion twin, so true edit-distance<=1 pair mass grows
LINEARLY with rows (unlike the dedup probes' quadratic replica mass)
and candidate-generation scaling is what's visible.

Usage: python scripts/scale_probe_er.py  (appends nothing; prints a
markdown table to paste into SCALE.md)
"""

from __future__ import annotations

import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.operators.joins import (
    fuzzy_join,
    sorted_neighborhood_pairs,
)
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark


def make_names(n: int, seed: int = 7) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        name = "".join(rng.choice(string.ascii_lowercase) for _ in range(12))
        rows.append((2 * i, name))
        if i % 10 == 0:  # 1-deletion twin -> a true distance-1 pair
            j = rng.randrange(len(name))
            rows.append((2 * i + 1, name[:j] + name[j + 1 :]))
    return rows


def bench(label, fn, runs=2):
    best = float("inf")
    n_pairs = None
    for _ in range(runs):
        t0 = time.perf_counter()
        n_pairs = fn().count()
        best = min(best, time.perf_counter() - t0)
    print(f"| {label} | {best:.2f} s | pairs={n_pairs} |", flush=True)
    return best, n_pairs


def main():
    spark = get_spark("scale-probe-er")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for n in (5_000, 200_000):
        rows = make_names(n)
        base = spark.createDataFrame(rows, "rid long, name string").persist()
        base.count()
        balanced = base.withColumn("blk", F.abs(F.hash("name")) % 32)
        hot = base.withColumn("blk", F.lit(0))  # adversarial: ONE block

        a_b = balanced.select("blk", F.col("rid").alias("id1"), F.col("name").alias("n1"))
        b_b = balanced.select("blk", F.col("rid").alias("id2"), F.col("name").alias("n2"))
        a_h = hot.select("blk", F.col("rid").alias("id1"), F.col("name").alias("n1"))
        b_h = hot.select("blk", F.col("rid").alias("id2"), F.col("name").alias("n2"))

        print(f"\n### rows={len(rows)}")
        results[(n, "nbhd_balanced")] = bench(
            f"fuzzy nbhd balanced ({n})",
            lambda: fuzzy_join(a_b, b_b, "blk", "n1", "n2", max_dist=1,
                               method="neighborhood").filter("id1 < id2"),
        )
        results[(n, "nbhd_hot")] = bench(
            f"fuzzy nbhd HOT block ({n})",
            lambda: fuzzy_join(a_h, b_h, "blk", "n1", "n2", max_dist=1,
                               method="neighborhood").filter("id1 < id2"),
        )
        results[(n, "snm")] = bench(
            f"sorted-neighborhood w=3 ({n})",
            lambda: sorted_neighborhood_pairs(
                balanced.select("blk", "rid", "name"), "name", window=3,
                partition_by="blk", carry=("rid", "name"),
            ),
        )
        if n == 5_000:  # block^2 contrast — only feasible small
            results[(n, "block_hot")] = bench(
                f"fuzzy BLOCK method HOT block ({n})",
                lambda: fuzzy_join(a_h, b_h, "blk", "n1", "n2", max_dist=1,
                                   method="block").filter("id1 < id2"),
            )
        base.unpersist()
    print("\nsummary:", {k: round(v[0], 2) for k, v in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
