"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {...}, "sf": ...}.

Per-query timing = full execution to a count-style materialization
(``df.count()`` after a no-op cache-bypassing action is avoided —
count alone executes the whole plan since every query aggregates,
filters, or projects; none are cached).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from multi_source_data_lake_with_etl_pipeline_spark import queries as q
from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("mdl-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the Python UDF worker pool (spark.python.worker.reuse keeps
    # them alive) so Arrow-UDF queries measure decode, not worker spawn.
    def _identity(batches):
        yield from batches

    spark.range(0, 32, 1, 32).mapInPandas(_identity, "id long").count()

    # Warm pass: run every query once at the smoke SF (untimed) so the
    # timed loop measures the engine's steady state, not first-run JIT
    # compilation of each query's generated code (cold HOF-heavy plans
    # measured 3-10x their steady-state cost).
    warm_dir = "/root/testdata/sf0.001"
    for name, fn in q.spark_queries().items():
        try:
            fn(spark, warm_dir).count()
        except Exception:
            pass
        spark.catalog.clearCache()

    # Median-of-N per query (default 3): this host is a shared VM and
    # CPU-bound stages can be throttled 3-10x by neighbor load for
    # minutes at a time. The median resists a single throttled attempt
    # in either direction, and the recorded per-attempt spread lets a
    # round-over-round comparison separate "moved beyond spread" from
    # noise (a single-shot number cannot — VERDICT r5 #3).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    # Soft wall-clock budget: when neighbor load stretches the run past
    # this, degrade to single attempts (never skip a query — a complete
    # JSON with noisier numbers beats a timeout with none).
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    bench_start = time.perf_counter()
    timings: dict[str, float] = {}
    attempts_by_query: dict[str, list[float]] = {}
    failures: dict[str, str] = {}

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    degraded: list[str] = []
    for name, fn in q.spark_queries().items():
        over_budget = time.perf_counter() - bench_start > budget_s
        if over_budget:
            degraded.append(name)
        got: list[float] = []
        attempts = 1 if over_budget else runs
        while attempts > 0:
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
            except Exception as exc:  # one broken query must not lose the run
                failures[name] = f"{type(exc).__name__}: {exc}"[:200]
                spark.catalog.clearCache()
                break
            got.append(time.perf_counter() - t0)
            # Release per-query persisted intermediates so queries are
            # measured independently (no cross-query memory pressure).
            spark.catalog.clearCache()
            attempts -= 1
        if got:
            timings[name] = round(_median(got), 4)
            attempts_by_query[name] = [round(x, 4) for x in got]

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # Per-attempt wall times (median is what "queries" carries) and
        # the spread — round-over-round comparisons treat a move WITHIN
        # a query's own spread as noise, beyond it as a real change.
        "runs": attempts_by_query,
        "spread": {
            n: round(max(xs) - min(xs), 4)
            for n, xs in attempts_by_query.items()
            if len(xs) > 1
        },
        # Queries the soft budget degraded to a SINGLE attempt (their
        # median is one cold-ish shot, not a median-of-3): a round-
        # over-round comparison should discount moves on these names.
        "degraded_to_single_attempt": degraded,
    }
    if failures:
        full["failed_queries"] = failures
    # Full per-query detail goes to a side file (the harness that
    # records this run keeps only the last ~2000 chars of stdout, so a
    # >2000-char JSON line is unparseable there). Stdout gets ONE short
    # line: summary + the slowest queries, trimmed to fit that window.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"),
    )
    detail_ref: str | None = "BENCH_DETAIL.json"
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh, indent=1, sort_keys=True)
    except OSError as exc:
        # Never advertise a detail file that wasn't written — a stale
        # side file silently misrepresenting the run is worse than none.
        detail_ref = None
        full_err = f"{type(exc).__name__}: {exc}"[:120]
        print(f"bench: BENCH_DETAIL write failed: {full_err}", file=sys.stderr)
    # Invariant/audit queries deliberately run an operator TWICE
    # (operator + independent verification); their cost is audit
    # overhead, not engine throughput. Split it out so round-over-round
    # comparisons can separate workload changes from engine changes.
    audit_sec = round(
        sum(t for n, t in timings.items() if n.endswith("_invariant")), 4
    )
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1]))
    while True:
        payload = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "n_queries": len(timings),
            "n_failed": len(failures),
            # How many queries the 420 s soft budget degraded to a
            # single timed attempt (full name list in the detail
            # file) — lets a PERF comparison discount single-shot
            # numbers without changing any timed path.
            "n_degraded": len(degraded),
            "audit_sec": audit_sec,
            "detail": detail_ref,
            "sf": sf_val,
        }
        if failures:  # few and critical — names belong on stdout
            payload["failed"] = sorted(failures)[:10]
        line = json.dumps(payload)
        if len(line) <= 1800 or not slowest:
            break
        slowest.pop(next(reversed(slowest)))  # drop the fastest inline entry
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
