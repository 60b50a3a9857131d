from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dqmtools_spark.session import get_spark

    sp = get_spark(app_name="dqmtools_spark_tests", master="local[4]",
                   shuffle_partitions=8)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
