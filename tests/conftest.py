from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Test sessions default to local[8]: the suite's jobs are KB-sized
# (sf0.001 + tiny synthetic frames), where 32 task slots only add
# scheduling overhead — measured ~10% faster suite at 8 with identical
# results. An explicit SPARK_GRAFT_CPUS (the driver's scaling runs)
# still wins; setdefault never overrides it.
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from multi_source_data_lake_with_etl_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("mdl-spark-tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
