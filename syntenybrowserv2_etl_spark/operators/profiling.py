"""Single-pass table profiling: per-column null counts, distinct counts,
and min/max — the data-quality report every ingest gate starts from.

The reference validates per-file and per-row (header contracts, required
fields, version lines — SURVEY §2.6); a warehouse additionally profiles
whole TABLES to catch drift the row gates can't see: a column going 40%
NULL, a key's distinct count collapsing, a timestamp range jumping a
decade. This is that operator, built to profile 100 TB in ONE scan.

Why one scan matters: the naive per-column loop (``for c in cols:
df.select(countDistinct(c)...)``) reads the table |columns| times. Here
every column's aggregates go into a single ``agg(...)`` — one scan, one
(tiny) exchange of partial aggregates, and the wide 1-row result is
reshaped to one-row-per-column with ``stack`` (a row-local expression on
a 1-row DataFrame). count_distinct over N columns in one aggregate is
N expand-style partial aggregates in one pass — still one data scan.

Numeric and timestamp min/max land in typed columns (doubles / epoch-µs);
string min/max in their own columns — no cross-type string casts, whose
formatting ('1.0E7' vs '10000000.0') is engine-specific and would break
value parity (q102's oracle mirrors the same shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType, TimestampType, TimestampNTZType


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in a single scan.

    Output: one row per column —
      (column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)
    where min/max_num carry numeric columns as double and timestamp
    columns as epoch-µs double; min/max_str carry string columns; the
    kind that doesn't apply is NULL.
    """
    if cols is None:
        cols = df.columns
    aggs = []
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{c}"))
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            # NTZ→LTZ cast preserves micros exactly under the pinned-UTC
            # session (the t() contract)
            lo = F.unix_micros(F.min(c).cast("timestamp")).cast("double")
            hi = F.unix_micros(F.max(c).cast("timestamp")).cast("double")
        elif isinstance(dt, NumericType):
            lo = F.min(c).cast("double")
            hi = F.max(c).cast("double")
        else:
            lo = hi = None
        aggs.append(
            (lo if lo is not None else F.lit(None).cast("double")).alias(
                f"__lo_{c}"
            )
        )
        aggs.append(
            (hi if hi is not None else F.lit(None).cast("double")).alias(
                f"__hi_{c}"
            )
        )
        if isinstance(dt, StringType):
            slo, shi = F.min(c), F.max(c)
        else:
            slo = shi = F.lit(None).cast("string")
        aggs.append(slo.alias(f"__slo_{c}"))
        aggs.append(shi.alias(f"__shi_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__nn_{c}`, `__nd_{c}`, `__lo_{c}`, `__hi_{c}`, "
        f"`__slo_{c}`, `__shi_{c}`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) as "
            "(column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        )
    )


# --- declarative expectations (the dbt-test / Deequ-style quality gate) ---
#
# The reference hard-codes its integrity checks inside each loader
# (duplicate-as-error, required fields, header contracts — SURVEY §2.6);
# a warehouse wants them DECLARED per table and evaluated as a suite,
# with per-expectation violation counts, not a first-failure abort.
# Each builder returns a ONE-ROW (expectation, n_violations) DataFrame —
# an aggregate, never a collected list of violating rows (at 100 TB the
# violation SET can itself be TB-sized; counts are the gate, sampled row
# retrieval is a separate targeted query). ``run_expectations`` unions
# the suite and derives the pass flag.


def expect_unique(name: str, df: DataFrame, cols: list[str]) -> DataFrame:
    """Violations = rows beyond the first per key = COUNT(*) − COUNT(DISTINCT key)."""
    return df.agg(
        F.lit(name).alias("expectation"),
        (
            F.count(F.lit(1)) - F.count_distinct(F.struct(*cols))
        ).alias("n_violations"),
    )


def expect_not_null(name: str, df: DataFrame, col: str) -> DataFrame:
    return df.agg(
        F.lit(name).alias("expectation"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_violations"),
    )


def expect_fk(
    name: str, child: DataFrame, col: str, parent: DataFrame, pcol: str
) -> DataFrame:
    """Orphaned child rows: non-null FK values with no parent. Anti-join
    on the key — broadcast when the parent is a dimension, shuffle-hash
    co-partitioned otherwise (Catalyst's call; the aggregate is one row
    either way)."""
    return (
        child.filter(F.col(col).isNotNull())
        .join(parent.select(F.col(pcol).alias(col)), col, "left_anti")
        .agg(
            F.lit(name).alias("expectation"),
            F.count(F.lit(1)).alias("n_violations"),
        )
    )


def expect_range(
    name: str, df: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Out-of-range or NULL values violate (a bound check that lets NULL
    through silently is the classic silent-drift hole)."""
    ok = (F.col(col) >= lo) & (F.col(col) <= hi)
    return df.agg(
        F.lit(name).alias("expectation"),
        F.sum((~F.coalesce(ok, F.lit(False))).cast("long")).alias(
            "n_violations"
        ),
    )


def expect_in(
    name: str, df: DataFrame, col: str, values: list
) -> DataFrame:
    ok = F.col(col).isin(values)
    return df.agg(
        F.lit(name).alias("expectation"),
        F.sum((~F.coalesce(ok, F.lit(False))).cast("long")).alias(
            "n_violations"
        ),
    )


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union a suite of expectation aggregates into the quality report:
    (expectation, n_violations, passed)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.withColumn("passed", F.col("n_violations") == 0)
