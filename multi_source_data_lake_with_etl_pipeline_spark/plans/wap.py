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
    # Publish is METADATA-ONLY: the staged table's files are re-listed
    # in a prod append commit by absolute path (the clone_to mechanism)
    # — the batch's bytes are written exactly once, at staging time.
    # A re-write through prod.append(staged_df) would double the write
    # I/O of every publish, which is the whole cost at 100 TB.
    # Lifecycle: prod now references the staging directory; deleting it
    # breaks those rows (same contract as a shallow clone's source).
    # prod.compact() localizes every foreign-path file when staging
    # needs to be reclaimed (pinned in tests/test_lake.py).
    _, active, staged_schema = staged._snapshot()
    _, _, prod_schema = prod._snapshot()
    if [
        (f.name, f.dataType) for f in staged_schema.fields
    ] != [(f.name, f.dataType) for f in prod_schema.fields]:
        raise ValueError(
            "WAP publish: staged schema differs from production "
            f"({staged_schema.simpleString()} vs {prod_schema.simpleString()})"
        )
    adds = [{**a, "path": staged._abs(a["path"])} for a in active]
    v = prod._commit(
        prod.latest_version() + 1, "append", adds, [], prod_schema, retries=20
    )
    return WapResult(True, n, [], v)
