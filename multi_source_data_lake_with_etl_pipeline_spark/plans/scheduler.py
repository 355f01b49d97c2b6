"""Driver-side task-graph runner (reference Airflow DAG parity,
``airflow/dags/multi_source_ingestion_dag.py:29-397``).

The reference orchestrates [extract_postgres, extract_mongodb,
extract_api] >> transform_validate >> load >> quality_report with
``retries=3``/``retry_delay`` and xcom result passing. Here the same
lifecycle is a plain topological runner over named tasks:

- a task is ``fn(results) -> value``; ``results`` holds every finished
  upstream value by task_id (the xcom-pull equivalent, without the
  serialize-to-metadata-DB detour — values are usually lazy DataFrames,
  so "passing" them builds ONE composite Spark plan rather than
  materializing per-task files the way the reference's xcom paths do);
- ``upstream`` declares edges; independent tasks are siblings in the
  topological order (Spark's scheduler already parallelizes the
  ACTIONS inside each task across the cluster, which is where the real
  concurrency lives — driver-side thread fan-out is deliberately not
  replicated);
- ``retries``/``retry_delay_s`` mirror the reference's retry policy
  with injectable sleep (tests run instantly);
- failures mark all transitive downstreams ``upstream_failed`` and the
  run keeps going on independent branches, like Airflow's default
  trigger rule.

Scale note: everything here is O(#tasks) driver bookkeeping; no row
ever passes through this module.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Task:
    task_id: str
    fn: Callable[[dict[str, Any]], Any]
    upstream: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_s: float = 0.0


@dataclass
class DagRun:
    """Run report: per-task state (success / failed / upstream_failed),
    attempt counts, results (xcom surface), and first error."""

    states: dict[str, str] = field(default_factory=dict)
    attempts: dict[str, int] = field(default_factory=dict)
    results: dict[str, Any] = field(default_factory=dict)
    errors: dict[str, str] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(s == "success" for s in self.states.values())


def topological_order(tasks: Sequence[Task]) -> list[Task]:
    """Deterministic Kahn order (declaration order among ready tasks);
    raises on unknown upstream ids or cycles."""
    by_id = {t.task_id: t for t in tasks}
    if len(by_id) != len(tasks):
        raise ValueError("duplicate task_id")
    for t in tasks:
        for u in t.upstream:
            if u not in by_id:
                raise ValueError(f"{t.task_id!r} depends on unknown task {u!r}")
    done: set[str] = set()
    order: list[Task] = []
    pending = list(tasks)
    while pending:
        ready = [t for t in pending if all(u in done for u in t.upstream)]
        if not ready:
            raise ValueError(
                "dependency cycle among: " + ", ".join(t.task_id for t in pending)
            )
        for t in ready:
            order.append(t)
            done.add(t.task_id)
        pending = [t for t in pending if t.task_id not in done]
    return order


def run_dag(
    tasks: Sequence[Task],
    sleep: Callable[[float], None] = time.sleep,
) -> DagRun:
    """Execute the graph; see module docstring for semantics."""
    run = DagRun()
    for t in topological_order(tasks):
        if any(run.states.get(u) != "success" for u in t.upstream):
            run.states[t.task_id] = "upstream_failed"
            run.attempts[t.task_id] = 0
            continue
        attempt = 0
        while True:
            attempt += 1
            try:
                run.results[t.task_id] = t.fn(run.results)
                run.states[t.task_id] = "success"
                break
            except Exception as exc:  # noqa: BLE001 — retry policy boundary
                if attempt > t.retries:
                    run.states[t.task_id] = "failed"
                    run.errors[t.task_id] = f"{type(exc).__name__}: {exc}"[:300]
                    break
                if t.retry_delay_s > 0:
                    sleep(t.retry_delay_s)
        run.attempts[t.task_id] = attempt
    return run
