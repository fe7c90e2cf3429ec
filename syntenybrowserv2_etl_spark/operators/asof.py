"""As-of (point-in-time) join — an operator Spark lacks natively.

Beyond-reference surface (the reference is batch genomics ETL; a
training-data / events pipeline needs point-in-time semantics: "for each
left row, the latest right row at-or-before its timestamp").

Spark formulation: NOT a range join (which explodes to BNLJ or needs
binning) — instead the classic union-and-carry-forward:

    tag left rows side=1, right rows side=0
    union on the key columns, sort within key by (ts, side)
    carry the last non-null right payload forward (window last() with
    ignoreNulls over rows unbounded-preceding..current)
    keep only left rows

Cost: ONE shuffle + sort on the join keys — identical to what a sort-merge
equi-join would pay, with O(1) state per row during the sort-scan. This is
the formulation that survives 100 TB: no per-row range probe, no interval
explosion, and AQE skew handling applies to the single exchange.

Precondition for determinism: the right side must be unique per
(keys, right_ts) — pre-aggregate duplicates (the demo query in queries.py
does) or pass ``dedup_right=True`` for a last-write-wins reduction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str | None = None,
    tolerance: Column | None = None,
    right_prefix: str = "",
    dedup_right: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Direction-aware inclusive as-of left join.

    ``direction="backward"`` (default): for each left row, attach the
    right row with the greatest ``right_ts <= left_ts`` within the same
    ``on`` key group. ``direction="forward"``: the SMALLEST ``right_ts >=
    left_ts`` — next-event attribution ("each click's next purchase"),
    the other half of the pandas ``merge_asof`` surface. Both are the
    same union-and-carry plan; forward just scans the per-key sort in
    descending ts order, so the carried right row is always the nearest
    at-or-after one. NULLs when no match exists — left-join semantics,
    all left rows survive.

    ``tolerance``: optional Column; backward nulls matches older than
    ``left_ts - tolerance``, forward nulls matches later than ``left_ts +
    tolerance`` (e.g. ``F.expr("INTERVAL 1 HOUR")`` for timestamps, a
    numeric literal for numeric ts).
    ``right_prefix``: prepended to right payload column names to avoid
    collisions with left columns.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    rt = right_ts or left_ts
    payload_cols = [c for c in right.columns if c not in on and c != rt]

    if dedup_right:
        w_d = Window.partitionBy(*on, rt).orderBy(*[F.col(c).desc() for c in payload_cols])
        right = (
            right.withColumn("__rn", F.row_number().over(w_d))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    r_struct = F.struct(F.col(rt).alias("__rts"), *[F.col(c) for c in payload_cols])
    tagged_r = right.select(
        *on,
        F.col(rt).alias("__ts"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    struct_type = tagged_r.schema["__r"].dataType
    tagged_l = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_type).alias("__r"),
        *[F.col(c) for c in left.columns if c not in on],
    )

    unioned = tagged_r.unionByName(tagged_l)
    # side=0 (right) sorts before side=1 (left) at equal ts → inclusive
    # match in BOTH directions: backward scans ts ascending, forward
    # scans ts descending, and either way the right row precedes the
    # left row it may serve at equal ts
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = F.last("__r", ignorenulls=True).over(w)
    out = (
        unioned.withColumn("__m", matched)
        .filter(F.col("__side") == 1)
        .drop("__ts", "__side", "__r")
    )
    if tolerance is not None:
        in_tol = (
            F.col("__m.__rts") >= F.col(left_ts) - tolerance
            if direction == "backward"
            else F.col("__m.__rts") <= F.col(left_ts) + tolerance
        )
        out = out.withColumn("__m", F.when(in_tol, F.col("__m")))
    return out.select(
        *on,
        *[c for c in left.columns if c not in on],
        *[
            F.col(f"__m.{c}").alias(f"{right_prefix}{c}")
            for c in payload_cols
        ],
    )
