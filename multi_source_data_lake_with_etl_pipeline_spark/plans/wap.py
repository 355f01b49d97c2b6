"""Write-Audit-Publish (WAP) for lake tables.

Governance pattern the reference's ETL DAG approximates with its
validate-then-load task ordering (multi_source_ingestion_dag.py:
extract → transform → validate → load): here the audit gates the
COMMIT itself. The incoming batch is staged as its own lake table,
the expectation suite (operators/validation.py) runs against the
staged files, and only a fully-passing audit appends into the
production table — a failed audit leaves production bit-identical
(readers never see quarantined data, no cleanup delete needed).

At 100 TB the staging write is the same distributed write the publish
would do; the audit is one scan-speed aggregation over the staged
batch (not the table), and publish re-registers the staged files'
rows via a normal append.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..lake import LakeTable
from ..operators.validation import Expectation, expectation_suite


@dataclass
class WapResult:
    published: bool
    staged_rows: int
    failed_expectations: list[str]
    prod_version: int


def write_audit_publish(
    spark: SparkSession,
    prod: LakeTable,
    batch: DataFrame,
    expectations: Sequence[Expectation],
    staging_path: str,
) -> WapResult:
    """Stage ``batch``, audit it, publish to ``prod`` only on a clean
    audit. Returns what happened; ``prod`` is untouched on failure."""
    staged = LakeTable.create(spark, staging_path, batch)
    staged_df = staged.read()
    audit = expectation_suite(staged_df, expectations).collect()
    failed = [r["expectation"] for r in audit if not r["passed"]]
    n = int(audit[0]["n_rows"]) if audit else 0
    if failed:
        return WapResult(False, n, failed, prod.latest_version())
    v = prod.append(staged_df)
    return WapResult(True, n, [], v)
