from __future__ import annotations

import pytest

from data_engineering_capstone_project__spark.session import get_spark

from _profile import FULL

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-root protocol e2e whose cost IS its point (bulk "
        "sizes, multi-path parity builds) — skipped in the default fast "
        "profile, run with SPARK_GRAFT_TEST_PROFILE=full",
    )


def pytest_collection_modifyitems(config, items):
    """Fast profile (the default — VERDICT r15 #1: the suite outgrew the
    driver's verify budget): skip tests marked ``slow``. One env var
    restores everything: ``SPARK_GRAFT_TEST_PROFILE=full`` both unskips
    these and restores full trial counts in the tests that use
    ``_profile.prof``. No test is deleted; the skip is visible in the
    run summary."""
    if FULL:
        return
    skip = pytest.mark.skip(
        reason="slow profile test (set SPARK_GRAFT_TEST_PROFILE=full)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
