"""Scale probe: histogram exact_percentiles vs Spark's exact
`percentile` aggregate as the corpus multiplies (round-5 rewrite
evidence). Corpus = sf0.1 lineitem (l_returnflag, l_extendedprice)
unioned K times (keys shifted so the VALUE domain stays fixed — the
histogram is bounded while the percentile buffer grows linearly).

Usage: python scripts/scale_probe_pct.py [multipliers...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.operators.quality import (
    exact_percentiles,
)

PS = {"p05": 0.05, "p50": 0.5, "p95": 0.95, "p99": 0.99}


def main() -> int:
    mults = [int(m) for m in sys.argv[1:]] or [1, 4, 16]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .appName("pct-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    for k in mults:
        df = base
        for i in range(1, k):
            df = df.unionAll(base)
        df = df.persist()
        n = df.count()
        nd = df.select("l_returnflag", "l_extendedprice").distinct().count()
        # alternating A/B in ONE session (VM noise discipline)
        t_hist, t_buf = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            exact_percentiles(df, ["l_returnflag"], "l_extendedprice", PS).collect()
            t_hist.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.groupBy("l_returnflag").agg(
                *[F.percentile("l_extendedprice", F.lit(p)).alias(a) for a, p in PS.items()]
            ).collect()
            t_buf.append(time.perf_counter() - t0)
        df.unpersist()
        print(
            json.dumps(
                {
                    "mult": k,
                    "rows": n,
                    "distinct_hist_rows": nd,
                    "hist_best_s": round(min(t_hist), 2),
                    "buffer_best_s": round(min(t_buf), 2),
                }
            ),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
