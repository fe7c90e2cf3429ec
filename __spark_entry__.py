"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``syntenybrowserv2_etl_spark/`` (see SURVEY.md §2
for the operator inventory each query exercises; queries.py maps every
registry entry to its SURVEY tags).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from syntenybrowserv2_etl_spark import queries as q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 6-table star join
    (revenue by region/nation with co-nation supplier condition)."""
    return q.REGISTRY["q03_revenue_by_nation"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for approximate/LSH ops —
    those get rows-only checks; their exact twins are oracle-checked)."""
    return q.all_oracles()
