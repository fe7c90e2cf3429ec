"""Slowly-changing-dimension type-2: history build + incremental apply.

The reference materializes replace-on-conflict dimension rows (INSERT OR
REPLACE, src/import_synteny_blocks.py:83-88) — the type-1 "current value"
discipline. A training-data warehouse additionally needs type-2 HISTORY
(when did each attribute hold?) and, at 100 TB, the ability to fold a CDC
change batch into an existing history WITHOUT rebuilding it from the full
event log: rebuild cost is O(all events ever), apply cost is O(batch +
affected keys).

``scd2_history`` is the from-scratch build (q86); ``apply_scd2`` is the
MERGE-shaped incremental twin, defined by the equivalence contract

    apply_scd2(scd2_history(old), new) == scd2_history(old ∪ new)

for any split where every ``new`` row is event-time-later than every
``old`` row of the same key (the append-only CDC contract; out-of-order
arrivals belong to the watermark/late-data machinery upstream, not to the
dimension merge). The contract is exactly what the q94 oracle checks
cross-engine, and what the foreachBatch streaming twin replays per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "k",
    ts_col: str = "ts",
    ord_col: str = "event_id",
) -> DataFrame:
    """Build type-2 history from an attribute-change event stream: per key,
    each change of ``attr_col`` opens a validity interval the next change
    closes; the last interval stays open (NULL valid_to).

    One shuffle on the key feeds both windows — change detection (lag) and
    interval close (lead) share the same partitioning and sort. Change
    detection is NULL-SAFE (row 1, else value IS DISTINCT FROM previous):
    a plain <> both loses transitions to a missing attribute and explodes
    runs of missing values into per-event intervals. Intervals emit as
    epoch-µs integers (the q21 timestamp representation contract).

    Output: (key, attr, valid_from_us, valid_to_us).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, ord_col)
    runs = (
        changes.withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
        .drop("__prev", "__rn")
    )
    return runs.select(
        key_col,
        attr_col,
        F.unix_micros(ts_col).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w)).alias("valid_to_us"),
    )


def apply_scd2(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "k",
    ts_col: str = "ts",
    ord_col: str = "event_id",
) -> DataFrame:
    """Fold a CDC change batch into an existing SCD2 history — the MERGE
    the from-scratch build (scd2_history / q86) cannot express at scale:
    the full history is TB-sized and mostly immutable; only each touched
    key's single OPEN row can change.

    Semantics (the rebuild-equivalence contract in the module docstring):
      1. the batch's own change-runs are detected exactly as in
         scd2_history (lag + row_number over (ts, ord));
      2. boundary absorb: a key's FIRST batch run whose value equals the
         key's current open value is no change at all and is dropped
         (without this, every heartbeat batch would fragment intervals);
      3. each key's open interval closes at its first surviving run's ts;
      4. surviving runs become new intervals, closed by lead() within the
         batch, last one open.

    Scale shape: closed history rows pass through UNTOUCHED — at 10¹²
    accumulated intervals the only joined state is the open-row set
    (≤ one row per key) semi-joined to the batch's keys, and the batch
    itself. One shuffle of the batch on the key (shared by both windows),
    one key-equi-join against the open rows; no window, no sort, and no
    rewrite over closed history. On a MERGE-capable table format steps
    3–4 are the two MERGE branches (UPDATE the open row, INSERT the new
    ones); on plain parquet the caller unions this result over the
    untouched closed partitions.

    Contract: every change row is event-time-later than every snapshot
    row of the same key (append-only CDC). Out-of-order arrivals are the
    upstream watermark's job (streaming/events.py late-data treatment).

    Output: (key, attr, valid_from_us, valid_to_us) — the complete new
    history (closed rows + updated open rows + inserted rows).
    """
    key = F.col(key_col)
    open_rows = snapshot.filter(F.col("valid_to_us").isNull()).select(
        key.alias("__key"),
        F.col(attr_col).alias("__cur"),
        F.col("valid_from_us").alias("__cur_from"),
    )
    closed_rows = snapshot.filter(F.col("valid_to_us").isNotNull())

    w = Window.partitionBy(key_col).orderBy(ts_col, ord_col)
    runs = (
        changes.withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .filter(
            (F.col("__rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
        .select(key_col, attr_col, ts_col, ord_col, "__rn")
    )
    # boundary absorb (2): only the first batch run can be a non-change,
    # and only for keys that HAVE an open row (a brand-new key's first run
    # is always a genuine interval — even a NULL-valued one, which is why
    # the guard is "has open row", not eqNullSafe alone)
    survived = (
        runs.join(open_rows, runs[key_col] == open_rows["__key"], "left")
        .filter(
            ~(
                (F.col("__rn") == 1)
                & F.col("__key").isNotNull()
                & F.col(attr_col).eqNullSafe(F.col("__cur"))
            )
        )
        .select(key_col, attr_col, ts_col, ord_col)
    )
    new_rows = survived.select(
        key_col,
        attr_col,
        F.unix_micros(ts_col).alias("valid_from_us"),
        F.unix_micros(F.lead(ts_col).over(w)).alias("valid_to_us"),
    )
    # (3) close each touched key's open interval at its first surviving
    # run; untouched keys keep their open row as-is
    first_change = survived.groupBy(key_col).agg(
        F.unix_micros(F.min(F.struct(ts_col, ord_col))[ts_col]).alias("__close_at")
    )
    updated_open = (
        open_rows.join(
            first_change,
            open_rows["__key"] == first_change[key_col],
            "left",
        )
        .select(
            F.col("__key").alias(key_col),
            F.col("__cur").alias(attr_col),
            F.col("__cur_from").alias("valid_from_us"),
            F.col("__close_at").alias("valid_to_us"),
        )
    )
    return closed_rows.select(
        key_col, attr_col, "valid_from_us", "valid_to_us"
    ).unionByName(updated_open).unionByName(new_rows)
