"""Driver-contract smoke: entry() returns rows with a stable schema; every
query runs at sf0.001; every oracle key exists in queries()."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"r_name", "n_name", "revenue", "n_items"}


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.columns  # plan builds; cheap action:
    assert df.limit(1).count() >= 0
