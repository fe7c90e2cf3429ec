from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from syntenybrowserv2_etl_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def pytest_collection_modifyitems(config, items):
    """Shard the collected tests when run under tools/partest.py.

    ``PARTEST_SHARD=i/n`` keeps only the tests whose stable nodeid hash
    lands on shard i — every worker process collects the full suite and
    deselects the rest, so the union across n workers is EXACTLY the
    single-process suite (no file-level grouping to go stale)."""
    shard = os.environ.get("PARTEST_SHARD")
    if not shard:
        return
    import zlib

    i, n = (int(x) for x in shard.split("/"))
    keep, drop = [], []
    for item in items:
        (keep if zlib.crc32(item.nodeid.encode()) % n == i else drop).append(item)
    items[:] = keep
    config.hook.pytest_deselected(items=drop)


@pytest.fixture(scope="session")
def spark():
    extra = None
    shard = os.environ.get("PARTEST_SHARD")
    if shard:
        # each worker gets its own warehouse so fixed-name saveAsTable
        # tests (bucketed-join pins) cannot collide across processes
        i = shard.split("/")[0]
        extra = {
            "spark.sql.warehouse.dir": os.path.abspath(
                f".scratch/partest/warehouse_{i}"
            )
        }
    s = get_spark(
        "tests",
        cpus=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")),
        extra_conf=extra,
    )
    yield s


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
