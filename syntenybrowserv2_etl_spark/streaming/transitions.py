"""Streaming maintenance of the first-order Markov transition matrix —
the incremental twin of q113 (queries.py), composed from the engine's two
state machines instead of bespoke plumbing:

  ``<state>/last``  — last event per user: a keyed MERGE-upsert table
      (streaming/merge.py) keyed by the user, arrival-ordered by
      ``[ts, ord]``. Per batch it reads and rewrites only the buckets the
      batch's users hash into — O(touched), flat in user-count.
  ``<state>/grid``  — the (prev_type, next_type) → count grid: a
      VERSIONED additive fold (the heavy_hitters_stream discipline —
      read latest committed ``__v=<id>``, write ``__v=<batch_id>``,
      marker last, prune after commit). The grid is |types|² rows —
      metadata-scale — so whole-grid versions are the honest layout; no
      bucket machinery needed.

Why state at all: a transition crosses micro-batch boundaries — the last
event of batch N and the first event of batch N+1 for the same user form
a real bigram that neither batch sees alone. Per batch:

  1. within-batch bigrams: one lag window over (user, ts, ord) — the
     exact q113 expression;
  2. boundary bigrams: the batch's FIRST event per user joined against
     the stored last events, read bucket-pruned
     (merge.merge_read_touched — I/O is O(touched buckets));
  3. both fold into the grid (versioned), THEN the last-event table
     merges forward. Order matters for replay: the boundary join must
     see the PRE-batch last state, and the merge marker (written last)
     is the overall commit — so a replay either skips everything
     (merge marker present), or skips only the fold (grid marker
     present) and re-runs the merge's own idempotent machinery, or
     re-runs both against unchanged pre-state. Every crash point
     replays to the same state (tests drive each window).

Delivery contract (same as scd2_apply_stream): batches arrive in
event-time order per user — a batch never contains an event older than
an already-applied one for the same user. Late data needs a re-fold from
the log, exactly like the batch twin.

NULL semantics match q113: a NULL event type never acts as a transition
SOURCE (lag/boundary rows with NULL prev are dropped) but may appear as
the destination.

Reference scope note: the reference engine (row-at-a-time
sqlite loaders, src/*.py) has no sequence surface; this module is part
of the mandated beyond-reference streaming tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import merge as merge_ops
from .events import _committed_version, _prune_versions


def transitions_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    ord_col: str = "event_id",
    n_buckets: int = 64,
) -> None:
    """One micro-batch of transition-matrix maintenance (the foreachBatch
    body of transitions_stream, module-level so tests can drive batches
    and crash points directly). Contracts documented at module level."""
    spark = batch_df.sparkSession
    last_path = f"{state_path}/last"
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(state_path).getFileSystem(spark._jsc.hadoopConfiguration())
    from ..sources.io import batch_is_committed as _bic

    if _bic(spark, last_path, batch_id):
        return  # overall commit (explicit marker or pruned watermark)
    batch_df = batch_df.localCheckpoint(eager=True)

    vstar, _, _ = _committed_version(spark, state_path, "grid")
    gmarker = hpath(f"{state_path}/_batches/{batch_id}")
    if not fs.exists(gmarker):
        w = Window.partitionBy(key_col).orderBy(ts_col, ord_col)
        seq = batch_df.select(
            key_col,
            type_col,
            F.lag(type_col).over(w).alias("__prev"),
            F.row_number().over(w).alias("__rn"),
        )
        trans = seq.filter(F.col("__prev").isNotNull()).select(
            F.col("__prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        pre = merge_ops.merge_read_touched(
            spark, last_path, batch_df.select(key_col)
        )
        if pre is not None:
            boundary = (
                pre.select(
                    F.col(key_col),
                    F.col(type_col).alias("__last_type"),
                )
                .join(
                    seq.filter(F.col("__rn") == 1).select(
                        key_col, F.col(type_col).alias("__first_type")
                    ),
                    key_col,
                )
                .filter(F.col("__last_type").isNotNull())
                .select(
                    F.col("__last_type").alias("prev_type"),
                    F.col("__first_type").alias("next_type"),
                )
            )
            trans = trans.unionByName(boundary)
        delta = trans.groupBy("prev_type", "next_type").agg(
            F.count(F.lit(1)).alias("n_trans")
        )
        if vstar is not None:
            prev_grid = spark.read.parquet(f"{state_path}/grid/__v={vstar}")
            delta = (
                prev_grid.unionByName(delta)
                .groupBy("prev_type", "next_type")
                .agg(F.sum("n_trans").alias("n_trans"))
            )
        staged = delta.localCheckpoint(eager=True)
        staged.write.mode("overwrite").parquet(
            f"{state_path}/grid/__v={batch_id}"
        )
        fs.mkdirs(gmarker)
        _prune_versions(fs, hpath, state_path, "grid", batch_id)

    # last-event merge — runs AFTER the fold so a replayed fold always
    # sees the pre-batch state; its marker is the overall commit
    w2 = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(ord_col).desc()
    )
    last_rows = (
        batch_df.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .select(key_col, type_col, ts_col, ord_col)
    )
    merge_ops.merge_upsert_batch(
        last_rows,
        batch_id,
        table_path=last_path,
        key_cols=[key_col],
        arrival_col=[ts_col, ord_col],
        n_buckets=n_buckets,
    )


def transitions_stream(
    stream_df: DataFrame,
    state_path: str,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    ord_col: str = "event_id",
    n_buckets: int = 64,
    query_name: str = "transitions",
    checkpoint: str | None = None,
):
    """Streaming transition-matrix maintenance — foreachBatch over
    transitions_fold_batch. Returns the started StreamingQuery
    (availableNow trigger; caller awaits termination)."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        transitions_fold_batch(
            batch_df,
            batch_id,
            state_path=state_path,
            key_col=key_col,
            type_col=type_col,
            ts_col=ts_col,
            ord_col=ord_col,
            n_buckets=n_buckets,
        )

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .outputMode("append")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_transition_matrix(
    spark: SparkSession, state_path: str, round_to: int = 4
) -> DataFrame:
    """The maintained matrix in q113's exact output shape:
    (prev_type, next_type, n_trans, p_next) with p_next rounded on the
    same lattice — after N event-time-ordered batches this equals the
    batch q113 computation over the accumulated log (equality-pinned in
    tests). The probability window runs on the stored |types|² grid."""
    vstar, _, _ = _committed_version(spark, state_path, "grid")
    if vstar is None:
        raise FileNotFoundError(
            f"no committed transition grid under {state_path}/grid — "
            "fold at least one batch first"
        )
    grid = spark.read.parquet(f"{state_path}/grid/__v={vstar}")
    tot = Window.partitionBy("prev_type")
    return grid.select(
        "prev_type",
        "next_type",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.sum("n_trans").over(tot),
            round_to,
        ).alias("p_next"),
    )
