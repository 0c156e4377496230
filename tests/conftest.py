"""Shared pytest fixtures: one small local SparkSession per test run
(the reference's analog is a module-scoped single-worker LocalCluster,
``tests/test_process.py:27-40`` — tests run the real engine,
miniaturized)."""

from __future__ import annotations

import tempfile

import pytest

from eggv_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    session = get_session(
        app_name="eggv-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "4g",
            # static conf: must be set at session build (bucketed-table tests)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="eggv-warehouse-"),
        },
    )
    yield session
    session.stop()


SF_DIR = "/root/testdata/sf0.001"
