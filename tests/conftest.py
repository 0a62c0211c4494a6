from __future__ import annotations

import pytest

from lol_data_collection_system_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lol-dcs-tests", master="local[4]", shuffle_partitions=8)
    yield s
