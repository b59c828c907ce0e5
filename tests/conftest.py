from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulseboard_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("PB_TEST_SF_DIR", "/root/testdata/sf0.001")

# The suite's plan tests assert the DEFAULT silver posture (session-cached);
# an inherited PB_SILVER_CACHE=0 from a user following the 100 TB recipe
# would fail every InMemoryTableScan assertion with no real regression.
# The opt-out itself is covered explicitly by test_silver_cache_opt_out.
os.environ.pop("PB_SILVER_CACHE", None)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pulseboard-tests", cpus=int(os.environ.get("PB_TEST_CPUS", "8")))
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
