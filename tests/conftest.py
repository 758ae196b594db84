from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TESTDATA = Path("/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from sifter_mrc_search_engine_spark.session import get_spark

    s = get_spark("sifter-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return str(TESTDATA / "sf0.001")
