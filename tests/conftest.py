from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simsearch_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the slow tier (multi-minute mount/lock/split suites) too",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute test (skipped by default; --runslow or "
        "SIMSEARCH_RUN_SLOW=1 runs the full tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r14 task 1): a plain `pytest tests/` must
    finish inside the external driver's time budget, so the multi-minute
    suites are marked `slow` and SKIPPED by default — no test is deleted,
    and `pytest tests/ --runslow` (or SIMSEARCH_RUN_SLOW=1) runs every
    tier exactly as before."""
    if config.getoption("--runslow") or os.environ.get("SIMSEARCH_RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow tier: run with --runslow or SIMSEARCH_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="simsearch-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Session-scoped alias for hypothesis tests (function-scoped fixtures
    trip hypothesis' health checks)."""
    return spark
