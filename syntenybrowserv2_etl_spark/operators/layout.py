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


def morton_key_nd(cols, bits: int = 21) -> "F.Column":
    """d-dimensional Morton interleave: result bit d·i+a is column a's
    bit i (axis 0 lowest — the 2-D ``morton_key`` is exactly
    ``morton_key_nd([x, y], bits)``). d·bits ≤ 62 keeps the key in a
    signed 64-bit long. Pure Column bit ops — whole-stage-codegen'd,
    zero Python at run time."""
    d = len(cols)
    if d < 1:
        raise ValueError("need at least one column")
    if not 0 < d * bits <= 62:
        raise ValueError(f"d*bits = {d * bits} must be in 1..62")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("long") for c in cols
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for a, c in enumerate(cs):
            key = key + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), d * i + a
            )
    return key


def morton_key_nd_sql(cols: list[str], bits: int = 21) -> str:
    """The identical d-dimensional formula as ANSI/DuckDB SQL text — the
    oracle twin of ``morton_key_nd`` (same bit ops, same order)."""
    d = len(cols)
    terms = []
    for i in range(bits):
        for a, c in enumerate(cols):
            terms.append(f"((({c} >> {i}) & 1) << {d * i + a})")
    return "(" + " + ".join(terms) + ")"


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
    write_zordered_nd(
        df, path, [x_col, y_col], bits, zbucket_bits, files_per_bucket
    )


def _domain_guard(key: "F.Column", cols, bits: int) -> "F.Column":
    """Fail the WRITE (not silently alias onto the curve) when a
    coordinate falls outside [0, 2^bits): morton_key only interleaves the
    low ``bits`` bits, so an out-of-domain value would land in the wrong
    cell and a later pruned read would MISS it — the contract violation
    ADVICE r8 named. raise_error stays JVM-side; in-domain rows pay two
    comparisons per axis."""
    lim = F.lit(1 << bits)
    ok = F.lit(True)
    for c in cols:
        cc = (F.col(c) if isinstance(c, str) else c).cast("long")
        ok = ok & (cc >= 0) & (cc < lim)
    # message parts are NULL-guarded: plain F.concat over a NULL
    # coordinate nulls the WHOLE message and the write dies with a bare
    # '[USER_RAISED_EXCEPTION] null' — losing the explanation exactly
    # when the offending values matter most
    return F.when(ok, key).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"z-order coordinate outside [0, 2^{bits}): "),
                *[
                    F.concat(
                        F.lit(f"{c}="),
                        F.coalesce(F.col(c).cast("string"), F.lit("NULL")),
                        F.lit(" "),
                    )
                    for c in cols
                ],
            )
        ).cast("long")
    )


def write_zordered_nd(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 21,
    zbucket_bits: int = 4,
    files_per_bucket: int = 1,
) -> None:
    """d-dimensional ``write_zordered`` (see its docstring for the layout
    and pruning contract): cluster on the Morton curve of ``cols``,
    directory-partitioned by the key's top ``zbucket_bits`` bits.
    Out-of-domain coordinates fail the write (``_domain_guard``)."""
    d = len(cols)
    if not 0 < zbucket_bits <= d * bits:
        raise ValueError("zbucket_bits must be in 1..d*bits")
    zb_shift = d * bits - zbucket_bits
    out = (
        df.withColumn(
            "zkey", _domain_guard(morton_key_nd(cols, bits), cols, bits)
        )
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


def zorder_box_cells_nd(
    box: list[tuple[int, int]], bits: int = 21, zbucket_bits: int = 4
) -> list[int]:
    """Grid cells (partition values of ``__zb``) a d-dimensional
    axis-aligned box can touch, for ANY zbucket_bits (the even-split
    restriction is gone: each candidate cell id is decoded back to its
    per-axis coordinate interval — the key's top bits fix each axis'
    top bits, so every axis' cell range is contiguous — and kept iff
    every interval intersects the box). Driver-side enumeration of
    2^zbucket_bits integers (metadata, like a partition-pruning
    IN-list), never a data scan. Box bounds outside [0, 2^bits) raise:
    out-of-domain bounds would alias onto the curve and silently
    exclude files the exact predicate matches."""
    d = len(box)
    if not 0 < zbucket_bits <= d * bits:
        raise ValueError("zbucket_bits must be in 1..d*bits")
    lim = 1 << bits
    for a, (lo, hi) in enumerate(box):
        if not (0 <= lo < lim and 0 <= hi < lim):
            raise ValueError(
                f"box bounds for axis {a} ({lo}, {hi}) outside [0, 2^{bits})"
            )
    top0 = d * bits - zbucket_bits  # first key-bit index inside the cell id
    cells = []
    for cell in range(1 << zbucket_bits):
        ok = True
        for a, (lo, hi) in enumerate(box):
            base, n_unknown = 0, 0
            for i in range(bits):
                j = d * i + a  # key bit for axis a's bit i
                if j >= top0:
                    base |= ((cell >> (j - top0)) & 1) << i
                else:
                    n_unknown += 1
            # unknown bits are axis a's LOW bits → contiguous interval
            a_lo, a_hi = base, base + (1 << n_unknown) - 1
            if a_hi < lo or a_lo > hi:
                ok = False
                break
        if ok:
            cells.append(cell)
    return cells


def zorder_box_buckets(
    x_lo: int, x_hi: int, y_lo: int, y_hi: int, bits: int = 21,
    zbucket_bits: int = 4,
) -> list[int]:
    """2-D wrapper over ``zorder_box_cells_nd`` (identical cell set for
    the even-zbucket_bits layouts the wrapper used to hand-enumerate;
    odd splits now work too)."""
    return zorder_box_cells_nd(
        [(x_lo, x_hi), (y_lo, y_hi)], bits, zbucket_bits
    )


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
    return read_zordered_box_nd(
        spark,
        path,
        [(x_lo, x_hi), (y_lo, y_hi)],
        [x_col, y_col],
        bits,
        zbucket_bits,
    )


def read_zordered_box_nd(
    spark,
    path: str,
    box: list[tuple[int, int]],
    cols: list[str],
    bits: int = 21,
    zbucket_bits: int = 4,
) -> DataFrame:
    """d-dimensional pruned box read (see ``read_zordered_box``).
    Out-of-domain box bounds raise in ``zorder_box_cells_nd`` — the
    pruned-read == full-scan contract only holds in-domain."""
    cells = zorder_box_cells_nd(box, bits, zbucket_bits)
    out = spark.read.parquet(path).filter(F.col("__zb").isin(cells))
    for c, (lo, hi) in zip(cols, box):
        out = out.filter((F.col(c) >= lo) & (F.col(c) <= hi))
    return out


def distributed_rank(df: DataFrame, *order_cols) -> DataFrame:
    """Exact 1-based global rank under a TOTAL order — without the
    single-partition window ``row_number() OVER (ORDER BY ...)`` plans
    to (the classic driver-shaped bottleneck at scale).

    Two-pass distributed rank: range-repartition on the sort key (so
    partition i holds keys strictly below partition i+1's), count rows
    per partition (a metadata-sized aggregate — one long per partition),
    broadcast the cumulative offsets back, and add the WITHIN-partition
    row_number (a per-partition window — parallel) to the partition's
    offset. The caller must pass a tie-broken total order (include a
    unique id); ranks are then exact regardless of where the range
    sampler drew the partition boundaries.

    The per-partition counts pass through the driver, but that is
    O(#partitions) longs — the same metadata scale as a file listing —
    never data rows.
    """
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=True)  # pin partitioning for both passes
    sizes = sorted(
        (r["__pid"], r["n"])
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for pid, n in sizes:
        offsets.append((pid, acc))
        acc += n
    off_df = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        ranged.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn("rank", (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )


def balanced_shards(
    df: DataFrame,
    size_col,
    id_col: str,
    n_shards: int,
) -> DataFrame:
    """Deterministic size-balanced shard assignment by SNAKE (boustro-
    phedon) placement: rank documents by (size DESC, id ASC), then deal
    ranks across shards alternating direction each pass — pass p of
    ``n_shards`` ranks goes left-to-right when p is even, right-to-left
    when odd. Greedy-quality balance (each shard gets one item per pass,
    and the zig-zag pairs a pass's largest with the next pass's
    smallest) while staying a closed-form function of rank — so it is
    exactly reproducible in SQL, unlike true greedy first-fit whose
    assignment depends on a sequential heap.

    Ranking uses ``distributed_rank`` (range partition + offsets), not a
    single-partition global window. Returns the per-shard report
    ``(shard, n_docs, total_size, size_share R6)`` ordered by shard.
    """
    s = F.col(size_col) if isinstance(size_col, str) else size_col
    ranked = distributed_rank(
        df.select(s.cast("long").alias("__sz"), F.col(id_col)),
        F.col("__sz").desc(),
        F.col(id_col).asc(),
    )
    assigned = ranked.select(
        "__sz",
        ((F.col("rank") - 1) % n_shards).alias("__pos"),
        (F.expr(f"(rank - 1) div {n_shards}") % 2).alias("__odd"),
    ).select(
        "__sz",
        F.when(F.col("__odd") == 0, F.col("__pos"))
        .otherwise(n_shards - 1 - F.col("__pos"))
        .alias("shard"),
    )
    tot = assigned.agg(F.sum("__sz").alias("__tot"))
    return (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__sz").alias("total_size"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_size").cast("long").alias("total_size"),
            F.round(F.col("total_size") / F.col("__tot"), 6).alias("size_share"),
        )
        .orderBy("shard")
    )
