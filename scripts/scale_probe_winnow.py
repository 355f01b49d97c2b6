"""Scale probe: winnowing fingerprint extraction (round 5) — per-doc
cost must be corpus-size-FLAT (zero-shuffle narrow map) and the stored
print density must track the paper's 2/(w+1) rate vs full k-gram
postings.

Usage: python scripts/scale_probe_winnow.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.spans import kgram_positions
from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.text_stats import (
    winnow_fingerprints,
)


def main() -> int:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .appName("winnow-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "text"
    )
    for k in mults:
        df = base
        for i in range(1, k):
            df = df.unionAll(base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
        df = df.persist()
        n = df.count()
        best_fp, best_grams = float("inf"), float("inf")
        n_prints = n_grams = 0
        for _ in range(2):  # alternating A/B, best-of-2
            t0 = time.perf_counter()
            n_prints = (
                winnow_fingerprints(df, k=4, w=5)
                .agg(F.sum(F.size("fp"))).collect()[0][0]
            )
            best_fp = min(best_fp, time.perf_counter() - t0)
            t0 = time.perf_counter()
            n_grams = kgram_positions(df, k=4).count()
            best_grams = min(best_grams, time.perf_counter() - t0)
        df.unpersist()
        print(
            json.dumps(
                {
                    "mult": k,
                    "docs": n,
                    "winnow_s": round(best_fp, 2),
                    "postings_s": round(best_grams, 2),
                    "prints": int(n_prints),
                    "grams": int(n_grams),
                    "density_pct": round(100.0 * n_prints / max(n_grams, 1), 1),
                    "us_per_doc_winnow": round(best_fp / n * 1e6, 1),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
