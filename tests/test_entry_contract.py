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


def test_driver_window_invariant():
    """The driver records correctness for the FIRST 50 registry entries
    only. Every non-demoted query must sit inside that window, every
    demoted query must still be registered WITH an oracle (its only value
    gate is test_oracle_parity), and no in-window query may appear in the
    demoted list. A register() call that silently pushes a query out of the
    window must fail here (and at import, via _reorder_registry)."""
    from syntenybrowserv2_etl_spark import queries as Q

    names = list(Q.REGISTRY)
    window = set(names[: Q.DRIVER_WINDOW])
    demoted = set(Q._DEMOTED_PAST_WINDOW)
    in_window_intended = [n for n in names if n not in demoted]
    assert len(in_window_intended) <= Q.DRIVER_WINDOW
    for n in in_window_intended:
        assert n in window, f"{n} fell outside the driver window"
    for n in demoted:
        assert n in Q.REGISTRY, f"demoted {n} not registered"
        assert Q.REGISTRY[n].oracle is not None, f"demoted {n} lost its oracle"


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF)
    assert df.columns  # plan builds; cheap action:
    assert df.limit(1).count() >= 0


def test_rotation_status_tool_runs():
    """tools/rotation_status.py derives the promotion queue from the
    committed CORRECTNESS history — pin that it runs and that its
    numbers are internally consistent with the registry."""
    import io
    import contextlib

    import tools.rotation_status as rs
    from syntenybrowserv2_etl_spark import queries as Q

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert rs.main() == 0
    out = buf.getvalue()
    assert f"registry: {len(Q.REGISTRY)}" in out
    assert "promotion queue" in out
