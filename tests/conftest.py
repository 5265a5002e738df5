import os

import pytest

os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")  # sandbox-only shuffle scratch

from gnames_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gnames_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
