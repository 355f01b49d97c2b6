"""Routing / fan-out loaders (reference L7-L9).

- ``MultiTargetLoader`` — same data to N destinations (asyncio.gather
  at ``base_loaders.py:326-373``) → persist once, write N times.
- ``LoaderManager.route_and_load`` — config-driven dispatch + load
  history (``base_loaders.py:395-451``).
- ``route_by_content`` — the DAG's name-based routing rules
  (``multi_source_ingestion_dag.py:267-305``): transactions/orders →
  structured zone, events/logs → semi-structured zone, users/profiles
  → both, everything → parquet archive.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame

from .files import write_file

# DAG routing rules (multi_source_ingestion_dag.py:272-277)
CONTENT_ROUTES: dict[str, list[str]] = {
    "transactions": ["structured"],
    "orders": ["structured"],
    "events": ["semi_structured"],
    "logs": ["semi_structured"],
    "users": ["structured", "semi_structured"],
    "profiles": ["structured", "semi_structured"],
}
ARCHIVE_ZONE = "archive"


def route_by_content(source_name: str) -> list[str]:
    """L9: zone list for a source name; archive always included."""
    zones = []
    for token, route in CONTENT_ROUTES.items():
        if token in source_name:
            zones.extend(z for z in route if z not in zones)
    zones.append(ARCHIVE_ZONE)
    return zones


class MultiTargetLoader:
    """L7: one DataFrame → N writers. ``df.persist()`` replaces the
    reference's shared in-memory record list; writes run sequentially
    (one Spark job each — the cluster parallelism is inside each job,
    not across jobs)."""

    def load(self, df: DataFrame, targets: list[dict]) -> list[dict]:
        df = df.persist()
        results = []
        for tgt in targets:
            t0 = time.perf_counter()
            try:
                write_file(df, **tgt)
                results.append(
                    {"target": tgt.get("path"), "status": "success",
                     "seconds": round(time.perf_counter() - t0, 3)}
                )
            except Exception as exc:
                results.append(
                    {"target": tgt.get("path"), "status": "failed", "error": str(exc)}
                )
        df.unpersist()
        return results


class LoaderManager:
    """L8: named-loader registry + routing config + load stats
    (base_loaders.py:386-451)."""

    def __init__(self):
        self._loaders: dict[str, Callable[..., None]] = {
            "file": lambda df, **cfg: write_file(df, **cfg),
        }
        self.load_history: list[dict] = []

    def register(self, name: str, fn: Callable[..., None]) -> None:
        self._loaders[name] = fn

    def route_and_load(self, df: DataFrame, routing_config: dict[str, dict]) -> dict:
        df = df.persist()
        results = {}
        for dest, spec in routing_config.items():
            loader_type = spec.get("type", "file")
            params = spec.get("params", {})
            t0 = time.perf_counter()
            try:
                self._loaders[loader_type](df, **params)
                results[dest] = {"status": "success",
                                 "seconds": round(time.perf_counter() - t0, 3)}
            except Exception as exc:
                results[dest] = {"status": "failed", "error": str(exc)}
            self.load_history.append({"destination": dest, **results[dest]})
        df.unpersist()
        return results

    def get_stats(self) -> dict:
        """Load statistics incl. last-10 history (base_loaders.py:438-451)."""
        ok = sum(1 for h in self.load_history if h["status"] == "success")
        return {
            "total_loads": len(self.load_history),
            "successful": ok,
            "failed": len(self.load_history) - ok,
            "recent_history": self.load_history[-10:],
        }
