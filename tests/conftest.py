import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpaste_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hpaste-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def base_dir(tmp_path):
    return str(tmp_path / "tables")
