"""Snapshot diffing: what changed between two versions of a table.

The reference rebuilds its database from scratch every run (each
import_*.py drops and reloads its table — src/import_genes.py:40-52);
a 100 TB warehouse cannot, so the operational question becomes "what did
this refresh actually change?" — powering incremental downstream rebuilds
(only re-embed changed documents), audit trails, and CDC emission when
the upstream can't provide one.

``snapshot_diff`` is one co-partitioned full-outer join on the key — at
scale both snapshots live bucketed by the key and, for NON-NULLABLE key
schemas (the common PK case), the join is shuffle-free: plain ``==`` on
the key columns satisfies the bucketed layout's distribution directly.
NULLABLE key columns get ``eqNullSafe`` instead (a NULL key must match
itself across snapshots) — and that choice is a real cost at scale:
Catalyst rewrites ``<=>`` keys into coalesce/isnull expressions that no
longer line up with a bucketed-by-key layout, so BOTH snapshots reshuffle
(verified: full_outer on two bucketBy(8, k) tables plans 0 Exchanges with
``==``, 2 with ``eqNullSafe``; pinned by
``test_snapshot_diff_bucketed_join_shuffle_free``). Declare keys
non-nullable when they are — the operator picks the comparator per
column from the schema. Row VALUE equality is always NULL-SAFE per
column (a column going NULL↔value is a change, two NULLs are not), and
the changed-column list is emitted in declaration order so the output is
deterministic and cross-engine checkable (q104).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    null_safe_keys: bool | None = None,
) -> DataFrame:
    """Diff two snapshots on ``key_cols``: one output row per key that
    was added, removed, or had any ``compare_cols`` value change.
    Unchanged keys are dropped (the overwhelmingly common case — the
    filter runs before anything widens).

    ``null_safe_keys``: ``None`` (default) derives the key comparator
    from the schemas — ``==`` when a key column is non-nullable on both
    sides, ``eqNullSafe`` otherwise. Parquet/bucketed-table read-back
    marks every column nullable, so for the common primary-key case pass
    ``null_safe_keys=False`` explicitly: the caller asserts keys contain
    no NULLs, the join stays ``==``, and two key-bucketed snapshots diff
    with ZERO exchanges (module docstring; under ``==`` a NULL-keyed row
    present unchanged on both sides would mis-report as added+removed).
    ``True`` forces ``eqNullSafe`` everywhere.

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
    # Join comparator per key column, from the SCHEMA: non-nullable keys
    # use == (bucketed layouts stay shuffle-free — module docstring);
    # nullable keys use eqNullSafe (a NULL key must match itself; under
    # plain == an unchanged NULL-keyed row would emit as added+removed).
    # Presence cannot be inferred from key-column nullness either way —
    # only the literal marker survives the outer join as NULL exactly
    # when the side is absent.
    nullable = {f.name: f.nullable for f in old.schema.fields}
    nullable_new = {f.name: f.nullable for f in new.schema.fields}
    cond = None
    for k in key_cols:
        ko, kn = F.col(f"__ko_{k}"), F.col(f"__kn_{k}")
        ns = (
            (nullable.get(k, True) or nullable_new.get(k, True))
            if null_safe_keys is None
            else null_safe_keys
        )
        eq = ko.eqNullSafe(kn) if ns else (ko == kn)
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
