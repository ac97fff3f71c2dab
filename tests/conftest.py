from __future__ import annotations

import os

import pytest

from f1_data_engineering_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Long-running soak / differential-fuzz / wall-clock-deadline tests are
#: opt-in: the default profile must finish inside an external runner's
#: window (the round-11 verify timed out mid-suite with zero failures —
#: a green suite the runner can't finish is indistinguishable from a red
#: one).  Set SPARK_GRAFT_FULL_TESTS=1 to run everything; the full
#: profile is still executed (and recorded) before each round closes.
RUN_SOAKS = os.environ.get("SPARK_GRAFT_FULL_TESTS", "") not in ("", "0")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "soak: long soak/fuzz/deadline test, skipped unless "
        "SPARK_GRAFT_FULL_TESTS=1",
    )


def pytest_collection_modifyitems(config, items):
    if RUN_SOAKS:
        return
    skip = pytest.mark.skip(
        reason="soak/fuzz profile disabled (set SPARK_GRAFT_FULL_TESTS=1)"
    )
    for item in items:
        if "soak" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="f1des-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
