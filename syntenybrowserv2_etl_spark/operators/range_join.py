"""Interval / range joins — the reference's implied genomic query surface.

Reference evidence: position indexes (taxonid, chr, start), (chr, start, end)
(src/import_genes_exons.py:58-61) and block coordinates
(src/import_synteny_blocks.py:45-52) encode the downstream workload:
"genes in range", "features in syntenic block".

A bare range predicate compiles to BroadcastNestedLoopJoin (O(n·m)) — fine
for a small broadcast side, catastrophic at 100 TB. Two engine strategies:

1. ``overlap_join`` — always equi-prefix on the natural partition key
   (taxon, chromosome): the join becomes shuffle-hash/sort-merge on the
   prefix with the range as a post-join filter. Chromosome count is small
   (~25/species) so per-key skew is real; AQE skew-join splits hot
   chromosomes.
2. ``binned_overlap_join`` — additionally bucketize positions into
   fixed-width bins and equi-join on (prefix, bin): each interval lands in
   every bin it overlaps (sized so most intervals hit 1-2 bins), which
   upper-bounds per-task fan-out regardless of chromosome length. This is
   the strategy that survives a 100× scale-up; dedup of multi-bin matches
   is by construction unnecessary because a pair is only emitted from the
   bin containing max(start_left, start_right).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def overlap_predicate(
    l_start: Column, l_end: Column, r_start: Column, r_end: Column
) -> Column:
    """Closed-interval overlap: l.start <= r.end AND l.end >= r.start."""
    return (l_start <= r_end) & (l_end >= r_start)


def _bin(col: Column | str, bin_width: int) -> Column:
    """Floor-division bin id. ``floor``, not truncate-toward-zero: a plain
    ``(x / w).cast('long')`` collapses bins -1 and 0 for negative
    coordinates, mis-bucketing any interval that crosses or sits below the
    origin (genomic coords are non-negative, but event deltas and offset
    spaces aren't)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c / bin_width).cast("long")


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    how: str = "inner",
) -> DataFrame:
    """Equi-prefixed interval-overlap join.

    ``on`` — the equality prefix (e.g. ["taxon_id", "chr"]); required, it is
    what keeps the physical plan a hash/sort-merge join instead of BNLJ.
    """
    ls, le = left_range
    rs, re_ = right_range
    lft, rgt = left.alias("l"), right.alias("r")
    cond = None
    for k in on:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    ov = overlap_predicate(
        F.col(f"l.{ls}"), F.col(f"l.{le}"), F.col(f"r.{rs}"), F.col(f"r.{re_}")
    )
    cond = ov if cond is None else (cond & ov)
    return lft.join(rgt, cond, how)


def binned_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_range: tuple[str, str],
    right_range: tuple[str, str],
    bin_width: int,
) -> DataFrame:
    """Interval join via bin bucketization — the 100 TB-safe physical path.

    Each side explodes to one row per overlapped bin (``sequence`` is a
    native expr; fan-out ≈ interval_width / bin_width + 1). The equi-join
    key becomes (prefix..., bin). A matching pair appears in every shared
    bin; it is kept only where the bin contains max(start_l, start_r), so
    output has no duplicates without a distinct (no extra shuffle).
    """
    ls, le = left_range
    rs, re_ = right_range

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(_bin(s, bin_width), _bin(e, bin_width))
            ),
        )

    lft = binned(left, ls, le).alias("l")
    rgt = binned(right, rs, re_).alias("r")
    cond = F.col("l.__bin") == F.col("r.__bin")
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    cond = cond & overlap_predicate(
        F.col(f"l.{ls}"), F.col(f"l.{le}"), F.col(f"r.{rs}"), F.col(f"r.{re_}")
    )
    # anchor bin: emit the pair only from the bin holding max(start_l, start_r)
    anchor = _bin(F.greatest(F.col(f"l.{ls}"), F.col(f"r.{rs}")), bin_width)
    joined = lft.join(rgt, cond & (F.col("l.__bin") == anchor), "inner")
    return joined.drop("__bin")


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_col: str,
    range_cols: tuple[str, str],
    bin_width: int | None = None,
    how: str = "inner",
    closed_end: bool = True,
) -> DataFrame:
    """Point-in-range join (SNP-in-gene, event-in-window).

    With ``bin_width`` the point maps to exactly ONE bin while intervals
    explode to their covered bins — equi-join on (prefix, bin), zero
    duplicate results, bounded fan-out. ``closed_end=False`` makes the
    interval half-open [start, end).
    """
    s, e = range_cols
    if bin_width is None:
        lft, rgt = points.alias("l"), intervals.alias("r")
        cond = None
        for k in on:
            c = F.col(f"l.{k}") == F.col(f"r.{k}")
            cond = c if cond is None else (cond & c)
        hi = (
            F.col(f"l.{point_col}") <= F.col(f"r.{e}")
            if closed_end
            else F.col(f"l.{point_col}") < F.col(f"r.{e}")
        )
        rng = (F.col(f"l.{point_col}") >= F.col(f"r.{s}")) & hi
        cond = rng if cond is None else (cond & rng)
        return lft.join(rgt, cond, how)
    pts = points.withColumn("__bin", _bin(point_col, bin_width))
    ivs = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(_bin(s, bin_width), _bin(e, bin_width))
        ),
    )
    lft, rgt = pts.alias("l"), ivs.alias("r")
    cond = F.col("l.__bin") == F.col("r.__bin")
    for k in on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    hi = (
        F.col(f"l.{point_col}") <= F.col(f"r.{e}")
        if closed_end
        else F.col(f"l.{point_col}") < F.col(f"r.{e}")
    )
    cond = cond & (F.col(f"l.{point_col}") >= F.col(f"r.{s}")) & hi
    return lft.join(rgt, cond, how).drop("__bin")
