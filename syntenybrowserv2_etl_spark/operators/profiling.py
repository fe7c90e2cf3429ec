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


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` in a single scan.

    Output: one row per column —
      (column, n_nulls, n_distinct, min_num, max_num, min_str, max_str)
    where min/max_num carry numeric columns as double and timestamp
    columns as epoch-µs double; min/max_str carry string columns; the
    kind that doesn't apply is NULL.

    ``approx=True`` swaps exact ``count_distinct`` for
    ``approx_count_distinct`` (HyperLogLog++, relative standard
    deviation ``rsd``) — the 100 TB mode: the exact multi-column
    distinct forces an Expand (one replica of the scan per column),
    so the aggregate's input is |cols| × corpus rows; the sketch
    eliminates the Expand entirely — the aggregate consumes the scan
    exactly once, with HLL buffers per column (plan-pinned by
    ``test_profile_table_approx_plan_no_expand``: ``Expand`` absent,
    ``approx_count_distinct`` present). Note the pass is still a
    SortAggregate when string columns are profiled — string min/max
    buffers aren't hash-aggregable (the SCALE.md q101 note) — the win
    is the |cols|× row replication feeding it, not the aggregate kind.
    Drift monitoring doesn't need exact cardinalities; ingest gates
    that do keep ``approx=False`` (the q101 oracle twin).

    Intermediate aliases are INDEX-based (``__nn_3``), never
    interpolated column names — a column named ``a`b'c`` profiles fine
    (the reshape references positions; the display name travels as a
    literal only).
    """
    if cols is None:
        cols = df.columns
    aggs = []
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        # backtick-quote (doubling embedded backticks) so the resolver
        # treats the whole name as ONE part — never a nested-field path
        col = F.col(f"`{c.replace('`', '``')}`")
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"__nn_{i}"))
        nd = (
            F.approx_count_distinct(col, rsd)
            if approx
            else F.count_distinct(col)
        )
        aggs.append(nd.alias(f"__nd_{i}"))
        if isinstance(dt, (TimestampType, TimestampNTZType)):
            # NTZ→LTZ cast preserves micros exactly under the pinned-UTC
            # session (the t() contract)
            lo = F.unix_micros(F.min(col).cast("timestamp")).cast("double")
            hi = F.unix_micros(F.max(col).cast("timestamp")).cast("double")
        elif isinstance(dt, NumericType):
            lo = F.min(col).cast("double")
            hi = F.max(col).cast("double")
        else:
            lo = hi = F.lit(None).cast("double")
        aggs.append(lo.alias(f"__lo_{i}"))
        aggs.append(hi.alias(f"__hi_{i}"))
        if isinstance(dt, StringType):
            slo, shi = F.min(col), F.max(col)
        else:
            slo = shi = F.lit(None).cast("string")
        aggs.append(slo.alias(f"__slo_{i}"))
        aggs.append(shi.alias(f"__shi_{i}"))
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{i}").alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__lo_{i}").alias("min_num"),
                F.col(f"__hi_{i}").alias("max_num"),
                F.col(f"__slo_{i}").alias("min_str"),
                F.col(f"__shi_{i}").alias("max_str"),
            )
            for i, c in enumerate(cols)
        ]
    )
    # row-local reshape of the 1-row aggregate (the stack() equivalent,
    # minus the SQL-text interpolation)
    return wide.select(F.explode(per_col).alias("r")).select("r.*")


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


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One-row skew diagnostic for a shuffle/join key: how unevenly do
    rows distribute over the key's values? The pre-flight check before
    choosing a join strategy at scale — a high Gini / top-1 share says
    "salt this key or let AQE split it" BEFORE the straggler task does.

        gini     Gini coefficient of rows-per-key (0 = uniform)
        hhi      Herfindahl index Σ (c/T)² (1/n_keys = uniform, 1 = one key)
        entropy  Shannon entropy of the key distribution (nats)
        top1_share  heaviest key's row share

    Scale shape: one row scan → per-key counts (map-side combinable) →
    COUNT-OF-COUNTS (how many keys occur c times) — a frame bounded by
    the number of DISTINCT MULTIPLICITIES, typically tiny even when keys
    number billions. The Gini's sorted-cumulative formula runs over that
    frame via the block identity (keys sharing a count c occupy a
    contiguous rank block, whose rank-sum is closed-form), so the one
    partition-less window here orders multiplicities, never keys — the
    same bounded-domain posture as roc_auc's distinct-score window.
    HHI/entropy/top-1 need no order at all.
    """
    from pyspark.sql import Window

    counts = (
        df.select(F.col(key_col).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    coc = counts.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    # keys with multiplicity c occupy ranks (start, start + m]; their
    # rank-sum is m*start + m(m+1)/2, each weighted by c in Σ i·c_(i).
    blocks = coc.withColumn(
        "start", F.coalesce(F.sum("m").over(w), F.lit(0))
    ).select(
        "c",
        "m",
        (
            F.col("c").cast("double")
            * (
                F.col("m").cast("double") * F.col("start")
                + F.col("m").cast("double") * (F.col("m") + 1) / 2
            )
        ).alias("rank_sum"),
    )
    agg = blocks.agg(
        F.sum(F.col("m") * F.col("c")).alias("t"),
        F.sum("m").alias("n_keys"),
        F.max("c").alias("max_c"),
        F.sum("rank_sum").alias("s_ranks"),
        F.sum(F.col("m") * F.col("c").cast("double") * F.col("c")).alias("s_c2"),
        F.sum(F.col("m") * F.col("c") * F.log("c")).alias("s_clnc"),
    )
    t = F.col("t").cast("double")
    nk = F.col("n_keys").cast("double")
    return agg.select(
        F.col("n_keys").cast("long").alias("n_keys"),
        F.col("t").cast("long").alias("n_rows"),
        F.col("max_c").cast("long").alias("max_count"),
        F.round(F.col("max_c") / t, 6).alias("top1_share"),
        F.round(
            F.lit(2.0) * F.col("s_ranks") / (nk * t) - (nk + 1) / nk, 6
        ).alias("gini"),
        F.round(F.col("s_c2") / (t * t), 8).alias("hhi"),
        F.round(F.log(t) - F.col("s_clnc") / t, 6).alias("entropy"),
    )


def exact_quantiles_bounded(
    df: DataFrame,
    group_col: str,
    value_col,
    qs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Per-group EXACT type-1 quantiles (smallest value whose cumulative
    count reaches ⌈q·n⌉ — no interpolation arithmetic) computed from the
    per-(group, value) COUNT frame — the scalable exact-quantile path
    when the value domain is bounded (lengths, scores, bucketed
    measures): the row scan reduces to a bounded-domain frame before any
    window runs, where q41's sorted-percentile plan carries full rows to
    the aggregation. The sibling trade to roc_auc's distinct-score
    window. Returns ``(group, q R4, v)`` — one row per (group, quantile).
    """
    from pyspark.sql import Window

    v = F.col(value_col) if isinstance(value_col, str) else value_col
    counts = (
        df.select(F.col(group_col).alias("g"), v.cast("long").alias("v"))
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.select(
        "g",
        "v",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("g")).alias("n"),
    )
    qf = F.array(*[F.lit(float(q)) for q in qs])
    grid = cum.select(
        "g", "v", "cum", "n", F.explode(qf).alias("q")
    ).filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
    return (
        grid.groupBy("g", "q")
        .agg(F.min("v").alias("v"))
        .select(
            F.col("g").alias(group_col),
            F.round("q", 4).alias("q"),
            F.col("v").cast("long").alias("v"),
        )
    )
