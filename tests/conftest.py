"""Shared pytest fixtures: one SparkSession for the whole test run."""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from kinesis_vcr_spark.session import get_spark

    spark = get_spark(
        app_name="kinesis_vcr_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
