from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from onetable_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


import os


@pytest.fixture(scope="session")
def spark():
    s = get_spark("onetable-tests", cpus=int(os.environ.get("OTB_TEST_CPUS", "8")))
    shuf = os.environ.get("OTB_TEST_SHUF")
    if shuf:
        s.conf.set("spark.sql.shuffle.partitions", shuf)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
