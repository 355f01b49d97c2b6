"""Batch-ANN scale probe: ivf_knn_join (index build vs query batch,
timed separately) against the broadcast crossJoin it replaced
(round-3 knn_label_eval plan), at 5k vs 200k corpus vectors (40x).
Synthetic unit vectors on a seeded 64-dim Gaussian; 100 query vectors
both times, m = sqrt(N) centroids, nprobe = 2.

The split matters: corpus→centroid assignment is O(N·m) and is the
ONE-TIME index build (at 100 TB it's a `partitionBy(_cid)` write via
`ivf_build`), while a query batch pays only probes + posting-list
candidates (~nprobe/m of the corpus per query). Timing them together
charges the whole index build to a single 100-query batch — the
brute-force crossJoin then wins at any N where N·m > |q|·N, i.e.
whenever m > |q|, which says nothing about the steady state.

Usage: python scripts/scale_probe_ann.py  (prints a markdown table for
SCALE.md)
"""

from __future__ import annotations

import math
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from multi_source_data_lake_with_etl_pipeline_spark.llm_ops.similarity import (
    cosine,
    ivf_assign_arrow,
    ivf_corpus_assign,
    ivf_knn_join,
)
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark


def make_vecs(n: int, dim: int = 64, seed: int = 11):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        nv = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append((i, [x / nv for x in v]))
    return out


def bench(label, fn, runs=2):
    best = float("inf")
    n = None
    for _ in range(runs):
        t0 = time.perf_counter()
        n = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"| {label} | {best:.2f} s | rows={n} |", flush=True)
    return best


def main():
    spark = get_spark("scale-probe-ann")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import Window

    for n in (5_000, 200_000):
        corpus = spark.createDataFrame(
            make_vecs(n), "rid long, rv array<double>"
        ).repartition(32).persist()
        corpus.count()
        qs = make_vecs(100, seed=99)
        qdf = spark.createDataFrame(qs, "qid long, qv array<double>").persist()
        qdf.count()
        m = max(8, int(math.sqrt(n)))
        cents = [(i, v) for i, v in make_vecs(m, seed=5)]
        print(f"\n### corpus={n}, m={m} centroids, nprobe=2, k=5, 100 queries")

        # Index build: O(N·m) exact assignment, persisted — the
        # amortized cost (a partitioned write at real scale).
        assigned = None

        def build():
            nonlocal assigned
            if assigned is not None:
                assigned.unpersist()
            assigned = ivf_corpus_assign(corpus, cents, vec_col="rv").persist()
            return assigned.count()

        bench(f"ivf index build exact/HOF ({n})", build, runs=1)
        def build_arrow():
            # persist + count like the exact build — a bare count()
            # would let Catalyst prune the assignment column away
            a = ivf_assign_arrow(corpus, cents, vec_col="rv").persist()
            n_rows = a.count()
            a.unpersist()
            return n_rows

        bench(f"ivf index build arrow ({n})", build_arrow, runs=1)
        bench(
            f"ivf_knn_join on built index ({n})",
            lambda: ivf_knn_join(qdf, assigned, cents, k=5, nprobe=2).count(),
        )

        def brute():
            w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("rid"))
            return (
                F.broadcast(qdf)
                .crossJoin(corpus)
                .select(
                    "qid",
                    "rid",
                    F.round(cosine(F.col("qv"), F.col("rv")), 4).alias("cos_sim"),
                )
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= 5)
                .count()
            )

        bench(f"broadcast crossJoin top-k ({n})", brute)
        assigned.unpersist()
        corpus.unpersist()
        qdf.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
