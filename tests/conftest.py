"""Shared Spark fixture for the test suite."""

from __future__ import annotations

import pytest

from data_reconciliation_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="recon-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()
