from __future__ import annotations

import os

import pytest

from tits_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # modest parallelism for test speed; shuffle partitions kept small so
    # tiny-data tests don't pay 200-task overheads
    s = get_spark("tits_spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def transcripts(spark):
    from tits_spark.datagen import generate_transcripts

    return generate_transcripts(spark, n_convs=200, seed=42).cache()
