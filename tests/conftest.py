from __future__ import annotations

import pytest

from govgis_nov2023_slim_spatial_server_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="govgis-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
