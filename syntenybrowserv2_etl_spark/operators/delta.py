"""Snapshot diffing: what changed between two versions of a table.

The reference rebuilds its database from scratch every run (each
import_*.py drops and reloads its table — src/import_genes.py:40-52);
a 100 TB warehouse cannot, so the operational question becomes "what did
this refresh actually change?" — powering incremental downstream rebuilds
(only re-embed changed documents), audit trails, and CDC emission when
the upstream can't provide one.

``snapshot_diff`` is one co-partitioned full-outer join on the key — at
scale both snapshots live bucketed by the key and the join is
shuffle-free; nothing else touches the data. Row equality is NULL-SAFE
per column (eqNullSafe: a column going NULL↔value is a change, two NULLs
are not), and the changed-column list is emitted in declaration order so
the output is deterministic and cross-engine checkable (q104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff two snapshots on ``key_cols``: one output row per key that
    was added, removed, or had any ``compare_cols`` value change.
    Unchanged keys are dropped (the overwhelmingly common case — the
    filter runs before anything widens).

    Output: (*key_cols, change_type ∈ {'added','removed','changed'},
    changed_cols — comma-joined changed column names, '' for
    added/removed).
    """
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    # NULL-safe on BOTH the join and the presence flags: a key containing
    # NULL must match itself (eqNullSafe), and presence cannot be inferred
    # from key-column nullness — only the literal marker survives the
    # outer join as NULL exactly when the side is absent.
    cond = None
    for k in key_cols:
        eq = F.col(f"__ko_{k}").eqNullSafe(F.col(f"__kn_{k}"))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, cond, "full_outer")
    in_old = F.col("__in_old").isNotNull()
    in_new = F.col("__in_new").isNotNull()
    diffs = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in compare_cols
    ]
    changed_cols = F.concat_ws(",", *diffs)
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *[
                F.coalesce(f"__ko_{k}", f"__kn_{k}").alias(k)
                for k in key_cols
            ],
            "change_type",
            F.when(F.col("change_type") == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
