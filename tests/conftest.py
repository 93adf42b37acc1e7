import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from tailpipe_spark.session import build_session

    s = build_session("tailpipe-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def workspace(tmp_path):
    from tailpipe_spark.catalog import Catalog

    return Catalog(str(tmp_path / "ws"))
