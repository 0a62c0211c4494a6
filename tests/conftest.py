from __future__ import annotations

import os
import sys

import pytest

# Python workers must be able to import test modules (mapInPandas
# functions defined in tests are pickled by reference); the env var has
# to be set before the JVM spawns workers.
_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in [_TESTS_DIR, os.environ.get("PYTHONPATH", "")] if p
)
if _TESTS_DIR not in sys.path:
    sys.path.insert(0, _TESTS_DIR)

from lol_data_collection_system_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lol-dcs-tests", master="local[4]", shuffle_partitions=8)
    yield s
