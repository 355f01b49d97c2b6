"""SparkSession factory.

Replaces the reference's hand-tuned concurrency knobs
(``config/settings.py:134-137`` — batch_size/parallel_workers/retries)
with Spark-native equivalents: AQE for runtime re-planning, partition
coalescing, skew-join handling, and task retries.

Scale notes (100 TB target):
- AQE is ON so shuffle partition counts and join strategies adapt to
  real data sizes at runtime; the static ``spark.sql.shuffle.partitions``
  below is only the local-mode default (32 = local core count).
- Broadcast threshold left at default 10 MB; dimension tables
  (region/nation/supplier at any SF) broadcast automatically and the
  operator layer adds explicit ``F.broadcast`` hints where the dim side
  is known-small by construction.
- ``maxPartitionBytes`` kept at default 128 MB so a 100 TB scan splits
  into ~800k input tasks — right-sized for 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "mdl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession with engine defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Coalesce post-shuffle partitions by SIZE (advisory 64 MB), not
        # toward default parallelism: with the default parallelismFirst=
        # true AQE keeps ~core-count tiny partitions "for parallelism",
        # which at any scale leaves reduce tasks far below the 100 MB-
        # 1 GB band the shuffle-efficiency guidance targets (and on
        # KB-sized working sets schedules 32 tasks where 1 suffices).
        # Size-based coalescing is scale-adaptive by construction: the
        # SAME setting yields 1 partition for a KB aggregate and
        # thousands for a 100 TB shuffle. Spark's own config reference
        # recommends parallelismFirst=false in real clusters.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("MDL_AQE_PARALLELISM_FIRST", "true"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Spark emits one generated class per codegen stage; a long
        # session (100+ distinct queries) fills the JVM's default
        # 240 MB code cache, after which HotSpot silently stops JIT
        # compilation and expression-heavy operators run interpreted
        # (measured 10-40x slowdowns late in a benchmark session).
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (e.g. the verify driver's). Only touches conf keys that are
    mutable after JVM start."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    return spark
