from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hyped_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hyped_spark_tests", cores=8, shuffle_partitions=8)
    yield s


SF_DIR = "/root/testdata/sf0.001"
