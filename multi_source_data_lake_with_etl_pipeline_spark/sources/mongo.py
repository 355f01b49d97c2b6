"""Mongo federation extractor (reference S2 collection scan + S8
aggregation passthrough, ``mongo_connector.py:95-116,225-240``,
``base_extractors.py:86-118``).

The reference's Mongo surface is ``find(filter, projection, limit)``
and ``aggregate(pipeline)``. Spark-side both map onto the public
MongoDB Spark Connector (DataSource v2, ``format("mongodb")``), whose
read options take the connection coordinates plus an
``aggregation.pipeline`` executed BY the mongod — filters and
projections run in the source, rows never cross the wire (the same
pushdown contract as the JDBC path).

Parallel scan: the connector's ``partitioner.options.*`` split the
collection by ranges of a partition field, giving every Spark task its
own cursor — the Mongo analogue of JDBC ``partitionColumn`` striping,
and the knob that matters when a 1000-executor cluster drains a
sharded collection.

No Mongo server or connector jar ships in this container, so the
option mapping is the tested unit (``tests/test_io_pipeline.py``);
``mongo_extract`` accepts an injectable ``reader`` for that and uses
the real ``spark.read`` otherwise.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def build_pipeline(
    filter_dict: dict[str, Any] | None = None,
    projection: dict[str, int] | list[str] | None = None,
    limit: int | None = None,
    pipeline: list[dict] | None = None,
) -> list[dict]:
    """Compose the source-side aggregation pipeline.

    ``pipeline`` (S8 raw passthrough) is mutually exclusive with the
    find-style arguments (S2). Filter docs use Mongo's own operator
    syntax (``{"a": 1, "b": {"$gte": 2}}``) so they pass through as a
    ``$match`` verbatim — the reference forwards them unchanged too
    (``mongo_connector.py:103``)."""
    if pipeline is not None:
        if filter_dict or projection or limit is not None:
            raise ValueError("pipeline is mutually exclusive with find-style args")
        return list(pipeline)
    stages: list[dict] = []
    if filter_dict:
        stages.append({"$match": filter_dict})
    if projection:
        proj = (
            {f: 1 for f in projection} if isinstance(projection, list) else projection
        )
        stages.append({"$project": proj})
    if limit is not None:
        stages.append({"$limit": int(limit)})
    return stages


def build_mongo_options(
    uri: str,
    database: str,
    collection: str,
    partition_field: str | None = None,
    partition_size_mb: int | None = None,
    **pipeline_args,
) -> dict[str, str]:
    """Map reference extract-config onto mongodb-format read options."""
    opts = {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }
    stages = build_pipeline(**pipeline_args)
    if stages:
        opts["aggregation.pipeline"] = json.dumps(stages)
    if partition_field is not None:
        opts["partitioner"] = (
            "com.mongodb.spark.sql.connector.read.partitioner.RangePartitioner"
        )
        opts["partitioner.options.partition.field"] = partition_field
    if partition_size_mb is not None:
        opts["partitioner.options.partition.size"] = f"{partition_size_mb}MB"
    return opts


def mongo_extract(
    spark: SparkSession,
    uri: str,
    database: str,
    collection: str,
    reader=None,
    **config,
) -> DataFrame:
    """S2/S8 extractor: build options, read via the mongodb DataSource.
    ``reader`` injects a fake in tests (no server/jar in this
    container)."""
    opts = build_mongo_options(uri, database, collection, **config)
    if reader is not None:
        return reader(opts)
    return spark.read.format("mongodb").options(**opts).load()
