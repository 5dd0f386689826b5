from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import pytest

from kinesis_log_watcher_spark.session import get_spark


def replay_parallel(*thunks):
    """Run independent streaming replays concurrently and return their
    results in order. A bounded micro-batch replay spends most of its
    wall-clock in per-batch machinery (offset log, state-store commit,
    job scheduling) on a near-idle 32-core JVM — SparkSession is
    thread-safe for independent queries, so tests that compare two or
    three replay configurations run them side by side instead of
    back to back (driver-contract: still ONE pytest process)."""
    with ThreadPoolExecutor(max_workers=max(2, len(thunks))) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="klw-tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
