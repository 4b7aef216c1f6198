from __future__ import annotations

import pytest

from sressentials_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("sressentials-tests", master="local[8]", shuffle_partitions=8)
    yield spark
    spark.stop()
