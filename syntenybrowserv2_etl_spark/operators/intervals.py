"""Interval coalescing (gaps-and-islands) — merge overlapping/touching
spans per group into their disjoint union.

Beyond-reference surface with a reference-shaped motivation: the
reference's genomic tables are interval-heavy (genes/exons/synteny blocks
with (start, end) spans — src/import_genes_exons.py), and "how much of the
axis is covered" questions (exon-covered bases per gene, block-covered
fraction per chromosome) are interval-UNION questions. The same primitive
is what a training-data pipeline needs for span bookkeeping (merging
redacted/duplicated character ranges before accounting), and what an
events pipeline needs for "time with ≥1 active X" rollups.

Scale shape — the naive formulations and why this isn't them:
- self-join on overlap (a.start <= b.end AND ...) explodes quadratically
  in every dense group and needs transitive post-merging anyway;
- iterative merging is a driver loop.
The gaps-and-islands plan is ONE window sort per group: an interval opens
a new island iff its start exceeds the running max end of every earlier
interval (closed-interval semantics: touching spans merge); the island id
is a running sum of those flags; islands groupBy-reduce to (min start,
max end). One shuffle + sort on the group key — the same exchange any
per-group window pays, AQE-skew-handled, no explosion. Works for any
orderable span type (dates, numerics, timestamps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Disjoint union of closed intervals per group.

    Output: group_cols + (``start_col``, ``end_col``) — one row per merged
    island, where overlapping OR touching (next.start <= running max end)
    input intervals fuse. Rows with NULL start or end are dropped (an
    unbounded span has no well-defined union; filter/repair upstream).
    Tie order inside the window cannot change the result: island
    boundaries depend only on the running max end, which is
    order-insensitive among equal (start, end) prefixes.
    """
    w = Window.partitionBy(*group_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
        .withColumn("__island", island)
        .groupBy(*group_cols, "__island")
        .agg(
            F.min(start_col).alias(start_col),
            F.max(end_col).alias(end_col),
        )
        .drop("__island")
    )


def interval_depth_profile(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Sweep-line coverage depth over HALF-OPEN ``[start, end)`` spans:
    per group, the piecewise-constant profile of how many intervals cover
    each point — segments (``seg_start``, ``seg_end``, ``depth``) between
    consecutive event boundaries, zero-depth segments included wherever
    they fall between busy ones (the profile is gap-complete within the
    group's hull; nothing outside it).

    The classic ±1 sweep, fully relational: each interval contributes a
    (+1 at start, −1 at end) event, events aggregate per boundary (tie
    order is irrelevant — they SUM), the running sum over boundaries is
    the depth in force from that boundary to the next. One shuffle on the
    group key (the same exchange the coalesce shares); max concurrency,
    utilization histograms, and over-subscription checks are one
    aggregate away. NULL spans and empty spans (start >= end) are
    dropped — a half-open empty interval covers nothing.
    """
    base = df.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(start_col) < F.col(end_col))
    )
    ev = base.select(
        *group_cols, F.col(start_col).alias("__p"), F.lit(1).alias("__d")
    ).unionByName(
        base.select(
            *group_cols, F.col(end_col).alias("__p"), F.lit(-1).alias("__d")
        )
    )
    # ONE exchange serves both stages: hash-partitioning on the group key
    # alone satisfies the boundary aggregation's clustering requirement
    # ((group, __p) is a superset) AND the window's — without this the
    # plan pays a (group, __p) shuffle for the agg and a second
    # group-only shuffle for the running sum (plan-pinned by
    # test_interval_depth_single_exchange)
    agg = (
        ev.repartition(*[F.col(c) for c in group_cols])
        .groupBy(*group_cols, "__p")
        .agg(F.sum("__d").alias("__d"))
    )
    w = Window.partitionBy(*group_cols).orderBy("__p")
    return (
        agg.withColumn("__next", F.lead("__p").over(w))
        .withColumn(
            "depth",
            F.sum("__d")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
        .filter(F.col("__next").isNotNull())
        .select(
            *group_cols,
            F.col("__p").alias("seg_start"),
            F.col("__next").alias("seg_end"),
            "depth",
        )
    )


def max_concurrency(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-group peak coverage depth (max concurrent ``[start, end)``
    spans) + the hull bounds it occurred within."""
    prof = interval_depth_profile(df, group_cols, start_col, end_col)
    return prof.groupBy(*group_cols).agg(
        F.max("depth").alias("max_depth"),
        F.min("seg_start").alias("hull_start"),
        F.max("seg_end").alias("hull_end"),
    )


def interval_gaps(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """The complement report: per group, the STRICT gaps between
    consecutive coalesced islands — (island end, next island start)
    pairs with end < start, i.e. the downtime/idle spans between busy
    periods. Output: group_cols + (``gap_after``, ``gap_before``) =
    (previous island's end, next island's start). Rides
    ``coalesce_intervals``'s single window; the LEAD is a second window
    function over the SAME partitioning, so Catalyst plans one sort —
    still one exchange end-to-end.
    """
    merged = coalesce_intervals(df, group_cols, start_col, end_col)
    w = Window.partitionBy(*group_cols).orderBy(start_col)
    return (
        merged.withColumn("__next_start", F.lead(start_col).over(w))
        .filter(F.col("__next_start").isNotNull())
        .select(
            *group_cols,
            F.col(end_col).alias("gap_after"),
            F.col("__next_start").alias("gap_before"),
        )
    )


def covered_length(
    df: DataFrame,
    group_cols: list[str],
    start_col: str,
    end_col: str,
    unit: str = "numeric",
) -> DataFrame:
    """Per-group union coverage: interval count + total covered length of
    the coalesced spans.

    ``unit="numeric"``: length = end - start per island (half-open-style
    measure over numeric spans). ``unit="days"``: spans are dates and
    length = datediff(end, start) + 1 (closed-interval day count — the
    exon-bases / shipment-in-transit-days convention).
    """
    merged = coalesce_intervals(df, group_cols, start_col, end_col)
    if unit == "days":
        span = F.datediff(F.col(end_col), F.col(start_col)) + F.lit(1)
    elif unit == "numeric":
        span = F.col(end_col) - F.col(start_col)
    else:
        raise ValueError(f"covered_length: unknown unit {unit!r}")
    return merged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(span).alias("covered"),
    )
