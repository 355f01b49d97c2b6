"""JDBC federation extractor (reference S1 Postgres scan semantics,
``base_extractors.py:47-84``, ``postgres_connector.py:87-145``).

The reference's Postgres extractor exposes: table or raw-query read,
WHERE passthrough, LIMIT/OFFSET pagination, and connection config.
Spark-side the same surface maps onto ``spark.read.jdbc`` options:

- WHERE / LIMIT / OFFSET fold into a pushdown subquery (``dbtable =
  (SELECT ...) sub``) so the filter executes IN the source database —
  the rows never cross the wire (S1's pushable-predicate semantics).
- Parallel scan: either ``partitionColumn/lowerBound/upperBound/
  numPartitions`` (range-striped) or an explicit ``predicates`` list
  (one WHERE clause per Spark partition) — this is how a 1000-executor
  cluster drains a big table without a single-connection bottleneck.

No JDBC driver jar ships in this container, so the option mapping is
the tested unit (``tests/test_io_pipeline.py``); ``jdbc_extract``
accepts an injectable ``reader`` for that, and uses the real
``spark.read`` otherwise.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession


def build_jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    where: str | None = None,
    limit: int | None = None,
    offset: int | None = None,
    partition_column: str | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 10_000,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    push_down_aggregate: bool | None = None,
    push_down_limit: bool | None = None,
    push_down_predicate: bool | None = None,
) -> dict[str, str]:
    """Map reference extract-config onto spark.read JDBC options.

    Exactly one of ``table`` / ``query``. WHERE/LIMIT/OFFSET wrap the
    relation in a pushdown subquery (executed by the remote database,
    matching ``base_extractors.py:62-79`` which appends them to its
    SQL). Range-partition options are passed through when all four are
    present."""
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    rel = table if table is not None else f"({query}) q"
    if where or limit is not None or offset is not None:
        sql = f"SELECT * FROM {rel}"
        if where:
            sql += f" WHERE {where}"
        if limit is not None:
            sql += f" LIMIT {limit}"
        if offset is not None:
            sql += f" OFFSET {offset}"
        rel = f"({sql}) sub"
    opts: dict[str, str] = {"url": url, "dbtable": rel, "fetchsize": str(fetch_size)}
    if partition_column is not None:
        if num_partitions is None or lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound and num_partitions"
            )
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    # Catalyst-side pushdown toggles (public spark.read.jdbc options):
    # with pushDownAggregate, a groupBy over the relation compiles to a
    # remote GROUP BY and only the aggregated rows cross the wire —
    # the DSv2 sibling of the explicit WHERE/LIMIT subquery above.
    for key, val in (
        ("pushDownAggregate", push_down_aggregate),
        ("pushDownLimit", push_down_limit),
        ("pushDownPredicate", push_down_predicate),
    ):
        if val is not None:
            opts[key] = "true" if val else "false"
    return opts


def jdbc_extract(
    spark: SparkSession,
    url: str,
    predicates: list[str] | None = None,
    reader=None,
    **config,
) -> DataFrame:
    """S1 extractor: build options, read via the JDBC DataSource.

    ``predicates`` (mutually exclusive with range partitioning): one
    source-side WHERE clause per Spark partition — the explicit-shard
    form of parallel ingest. ``reader`` injects a fake in tests (no
    driver jar in this container)."""
    opts = build_jdbc_options(url, **config)
    if predicates is not None:
        if "partitionColumn" in opts:
            raise ValueError("predicates and partition_column are mutually exclusive")
        if reader is not None:
            return reader(opts, predicates)
        props = {k: opts[k] for k in ("user", "password", "driver", "fetchsize") if k in opts}
        return spark.read.jdbc(url, opts["dbtable"], predicates=predicates, properties=props)
    if reader is not None:
        return reader(opts, None)
    return spark.read.format("jdbc").options(**opts).load()
