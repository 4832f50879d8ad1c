from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="crawler-tests",
        master="local[4]",
        shuffle_partitions=4,
        # CRAWLER_TEST_DRIVER_MEM: run_tests.py raises this for sharded
        # runs — 4 concurrent JVMs under host contention starved one
        # shard's 4g execution pool (UNABLE_TO_ACQUIRE_MEMORY in a
        # hash-agg during a warehouse write; the same test passes solo)
        extra_conf={
            "spark.driver.memory": os.environ.get(
                "CRAWLER_TEST_DRIVER_MEM", "4g"
            )
        },
    )
    yield s


@pytest.fixture(autouse=True)
def _release_spark_resources(request):
    """Endurance: one shared JVM runs the whole suite — drop cached
    DataFrames after every test so persisted intermediates from 14+
    crawl runs cannot accrete into executor storage (the round-1
    full-suite py4j flake)."""
    yield
    if "spark" in request.fixturenames:
        request.getfixturevalue("spark").catalog.clearCache()


@pytest.fixture()
def wh_root(tmp_path):
    return str(tmp_path / "warehouse")
