from __future__ import annotations

import pytest

from kinesis_log_watcher_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="klw-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
