"""Multi-dimensional data layout: Z-order (Morton) clustering + pruned
box reads.

The reference emits sorted single-key output (sorted emission, SURVEY
§2.5 A6 — src/import_genes.py:154-163 orders by one key); a 100 TB
warehouse also needs MULTI-key locality: queries that box-filter on two
columns at once (customer × date, chromosome × position, domain × crawl
time) want both predicates to prune the SAME file set, which no single
sort order gives. Interleaving the two keys' bits (the Z-order / Morton
curve — the technique behind Delta/Iceberg OPTIMIZE ZORDER) makes files
cluster in both dimensions simultaneously: any axis-aligned box touches
only the curve segments crossing it.

The key is a pure Column expression (42 bit ops for 21-bit coordinates —
whole-stage-codegen'd, constant-folded, zero Python), so it pushes into
writes, range-partitioners, and filters; the deterministic integer output
also makes it exactly value-checkable against a same-formula SQL oracle
(q102).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def morton_key(x, y, bits: int = 21) -> "F.Column":
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: result bit 2i is x's bit i, bit 2i+1 is y's bit i (y-major).
    2·bits ≤ 62 keeps the key in a signed 64-bit long; callers clamp or
    rescale coordinates wider than ``bits`` bits (the curve needs a
    bounded domain, exactly like any space-filling index).
    """
    if not 0 < bits <= 31:
        raise ValueError("bits must be in 1..31")
    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    x, y = x.cast("long"), y.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def morton_key_sql(x: str, y: str, bits: int = 21) -> str:
    """The identical formula as ANSI/DuckDB SQL text — the q102 oracle
    twin of ``morton_key`` (same bit ops, same order, exact integers)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 21,
    zbucket_bits: int = 4,
    files_per_bucket: int = 1,
) -> None:
    """Persist ``df`` clustered on the Z-order curve of (x_col, y_col):
    rows land in directory partitions keyed by the curve's top
    ``zbucket_bits`` bits (a coarse 2^(b/2) × 2^(b/2) grid over the
    domain), sorted by the full key within each file.

    Two pruning levers, both free at read time: the partition directory
    prunes whole grid cells that miss a box filter (``zorder_box_buckets``
    computes the candidate cells), and the within-file sort gives parquet
    row-group min/max stats on ``zkey`` for sub-file skipping. At 100 TB,
    ``zbucket_bits`` sizes the grid (each cell should hold a few files of
    a few hundred MB).

    The spread uses ``repartitionByRange(__zb, zkey)`` — NOT a hash
    repartition on ``__zb``: hash partitioning puts each cell's every row
    in ONE task no matter how many partitions are requested, so a hot
    cell would always become one giant file. Range partitioning on the
    (cell, key) pair keeps cells contiguous (one dir each via
    partitionBy) while splitting a hot cell across tasks at curve-order
    boundaries — multiple sorted files whose zkey ranges don't overlap,
    which is exactly what row-group skipping wants.
    """
    zb_shift = 2 * bits - zbucket_bits
    out = (
        df.withColumn("zkey", morton_key(x_col, y_col, bits))
        .withColumn("__zb", F.shiftright(F.col("zkey"), zb_shift))
    )
    (
        out.repartitionByRange(
            files_per_bucket * (1 << zbucket_bits), "__zb", "zkey"
        )
        .sortWithinPartitions("__zb", "zkey")
        .write.mode("overwrite")
        .partitionBy("__zb")
        .parquet(path)
    )


def zorder_box_buckets(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = 21,
    zbucket_bits: int = 4,
) -> list[int]:
    """Grid cells (partition values of ``__zb``) an axis-aligned box can
    touch. The top zbucket_bits of the key interleave the top bits of x
    and y, so the cell set is the cross product of each axis' coarse-bit
    range — a driver-side enumeration of ≤ 2^zbucket_bits integers
    (metadata, like a partition-pruning IN-list), never a data scan."""
    if zbucket_bits % 2:
        # an odd split would stagger the x/y bit positions inside the
        # cell id; even splits keep the cell a clean (x-top, y-top)
        # interleave — and a square coarse grid is what you want anyway
        raise ValueError("zbucket_bits must be even")
    x_bits = y_bits = zbucket_bits // 2
    xs = range(x_lo >> (bits - x_bits), (x_hi >> (bits - x_bits)) + 1)
    ys = range(y_lo >> (bits - y_bits), (y_hi >> (bits - y_bits)) + 1)
    cells = set()
    for xh in xs:
        for yh in ys:
            cell = 0
            # reproduce the key's top-bit layout: interleave xh/yh so the
            # cell id equals zkey >> (2*bits - zbucket_bits)
            for i in range(x_bits):
                cell |= ((xh >> i) & 1) << (2 * i)
            for i in range(y_bits):
                cell |= ((yh >> i) & 1) << (2 * i + 1)
            cells.add(cell)
    return sorted(cells)


def read_zordered_box(
    spark,
    path: str,
    x_lo: int,
    x_hi: int,
    y_lo: int,
    y_hi: int,
    x_col: str,
    y_col: str,
    bits: int = 21,
    zbucket_bits: int = 4,
) -> DataFrame:
    """Box query over a ``write_zordered`` table: partition-prune to the
    candidate grid cells, then apply the exact box predicate (pushed to
    the parquet scan). The pruned read is what the layout buys — the
    exact filter alone would touch every file."""
    cells = zorder_box_buckets(x_lo, x_hi, y_lo, y_hi, bits, zbucket_bits)
    return (
        spark.read.parquet(path)
        .filter(F.col("__zb").isin(cells))
        .filter(
            (F.col(x_col) >= x_lo)
            & (F.col(x_col) <= x_hi)
            & (F.col(y_col) >= y_lo)
            & (F.col(y_col) <= y_hi)
        )
    )
