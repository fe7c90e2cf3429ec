"""Streaming interval-coverage maintenance + the generic touched-bucket
fold it rides on.

``touched_bucket_fold`` is the engine's per-batch state-maintenance
discipline — proven by the merge/scd2/rollup sinks and hardened in round
11 — extracted as a reusable primitive, so new keyed-state streaming
operators get the whole contract from one implementation instead of
re-deriving it:

  - state lives parquet-partitioned by ``__kb = pmod(hash(keys),
    n_buckets)``; a batch reads and rewrites ONLY the buckets its keys
    hash into (O(touched) I/O, flat in state size — the merge-sink
    SCALE curve's contract);
  - ``_batches/<id>`` marker written LAST + watermark-aware skip
    (``sources/io.batch_is_committed``) makes at-least-once delivery
    exactly-once in effect;
  - dynamic partition overwrite's delete-then-rename crash window is
    closed by the ``_pre/<batch_id>`` pre-state snapshot (+``__snapdone``
    sentinel): replay re-merges stale buckets from the immutable
    snapshot, never the possibly-torn live tree (ADVICE r10);
  - per-bucket ``__b`` provenance keeps fully-committed replays from
    rewriting anything (optimization only — a failed detection read
    falls back to all-stale, which the snapshot makes always correct).

``interval_fold_batch`` applies it to q127's operator: the state is each
group's COALESCED disjoint islands; a micro-batch's intervals coalesce
against the stored islands per group. Merging is associative and
idempotent-on-replay (coalesce(coalesce(A) ∪ B) = coalesce(A ∪ B)), so
the fold needs no arrival ordering at all. State size is bounded by the
ISLAND count (merged spans), not the raw interval count — a group that
has seen a billion overlapping intervals stores the handful of disjoint
spans they union to.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intervals import coalesce_intervals

_LAYOUT_COLS = ("__kb", "__b")


def touched_bucket_fold(
    batch_df: DataFrame,
    batch_id: int,
    *,
    path: str,
    key_cols: list[str],
    merge_fn: Callable[[DataFrame | None, DataFrame], DataFrame],
    n_buckets: int = 64,
) -> None:
    """One micro-batch of a keyed touched-bucket state fold (contract in
    the module docstring).

    ``merge_fn(pre, batch_part)`` computes a bucket set's NEW contents
    from its stored pre-state (``None`` when the buckets held nothing)
    and the batch rows routed to them; it must be deterministic in its
    inputs (replay re-runs it) and leave ≥ 1 row for every key it was
    given (the ``__b``-provenance commit test relies on every touched
    bucket receiving rows). ``batch_df`` should already be reduced to
    per-key bounded size by the caller (each sink's own pre-reduction —
    LWW max_by, within-batch coalesce, partial aggregation).
    """
    spark = batch_df.sparkSession
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    from ..sources.io import batch_is_committed

    marker_p = hpath(f"{path}/_batches/{batch_id}")
    if batch_is_committed(spark, path, batch_id):
        fs.delete(hpath(f"{path}/_pre/{batch_id}"), True)
        return
    batch_df = batch_df.localCheckpoint(eager=True)
    kb = F.pmod(F.hash(*[F.col(k) for k in key_cols]), F.lit(n_buckets))
    touched = [
        r["__kb"]
        for r in batch_df.select(kb.alias("__kb")).distinct().collect()
    ]
    if not touched:
        fs.mkdirs(marker_p)
        return
    existing = (
        {
            int(st.getPath().getName().split("=", 1)[1])
            for st in fs.globStatus(hpath(f"{path}/__kb=*"))
        }
        if fs.exists(hpath(path))
        else set()
    )
    # pre-state snapshot before any overwrite (module docstring)
    pre_dir = f"{path}/_pre/{batch_id}"
    snap_done = hpath(f"{pre_dir}/__snapdone")
    futil = spark._jvm.org.apache.hadoop.fs.FileUtil
    conf = spark._jsc.hadoopConfiguration()
    fresh_snapshot = not fs.exists(snap_done)
    if fresh_snapshot:
        fs.delete(hpath(pre_dir), True)
        fs.mkdirs(hpath(pre_dir))
        for b in sorted(set(touched) & existing):
            futil.copy(
                fs, hpath(f"{path}/__kb={b}"),
                fs, hpath(f"{pre_dir}/__kb={b}"),
                False, conf,
            )
        fs.mkdirs(snap_done)
    snap_buckets = {
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.globStatus(hpath(f"{pre_dir}/__kb=*"))
    }

    def snap_pre(buckets: list[int]) -> DataFrame | None:
        paths = [f"{pre_dir}/__kb={b}" for b in buckets if b in snap_buckets]
        if not paths:
            return None
        return (
            spark.read.option("basePath", pre_dir)
            .parquet(*paths)
            .drop(*_LAYOUT_COLS)
        )

    # Committed-bucket detection runs even when the snapshot was freshly
    # taken: tempting as it is to skip it then ("the overwrite can't have
    # started before __snapdone"), a COMMITTED batch whose marker was
    # lost AFTER the snapshot reap presents exactly this way — fresh
    # snapshot, yet live buckets carry __b == batch_id — and detection is
    # what lets that replay restore the marker without rewriting (and
    # what keeps a NON-idempotent merge_fn from re-merging against its
    # own post-state). The read is (__kb, __b)-column-pruned over the
    # touched buckets only — metadata-cheap next to the merge itself.
    del fresh_snapshot  # documents the rejected optimization above
    committed: set[int] = set()
    read_live = sorted(set(touched) & existing)
    if read_live:
        try:
            committed = {
                r["__kb"]
                for r in spark.read.option("basePath", path)
                .parquet(*[f"{path}/__kb={b}" for b in read_live])
                .filter(F.col("__b") == batch_id)
                .select("__kb")
                .distinct()
                .collect()
            }
        except Exception:
            committed = set()
    stale = [b for b in touched if b not in committed]
    if stale:
        merged = merge_fn(
            snap_pre(stale), batch_df.filter(kb.isin(stale))
        ).localCheckpoint(eager=True)
        (
            merged.withColumn("__b", F.lit(batch_id).cast("long"))
            .withColumn(
                "__kb",
                F.pmod(F.hash(*[F.col(k) for k in key_cols]), F.lit(n_buckets)),
            )
            .repartition("__kb")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__kb")
            .parquet(path)
        )
    fs.mkdirs(marker_p)
    fs.delete(hpath(pre_dir), True)


def interval_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    group_col: str,
    start_col: str,
    end_col: str,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of streaming interval-coverage maintenance: the
    stored state is each group's coalesced disjoint islands
    (q127's operator maintained incrementally). A batch's raw intervals
    first coalesce WITHIN the batch (bounded rows per group reach the
    bucket merge — the merge sink's pre-reduction discipline), then fold
    into the touched groups' stored islands.
    """
    reduced = coalesce_intervals(
        batch_df.select(group_col, start_col, end_col),
        [group_col],
        start_col,
        end_col,
    )

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        both = part if pre is None else pre.unionByName(part)
        return coalesce_intervals(both, [group_col], start_col, end_col)

    touched_bucket_fold(
        reduced,
        batch_id,
        path=state_path,
        key_cols=[group_col],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def interval_fold_stream(
    stream_df: DataFrame,
    state_path: str,
    group_col: str,
    start_col: str,
    end_col: str,
    n_buckets: int = 64,
    query_name: str = "interval_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``interval_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        interval_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            group_col=group_col,
            start_col=start_col,
            end_col=end_col,
            n_buckets=n_buckets,
        )

    writer = (
        stream_df.writeStream.foreachBatch(fold)
        .outputMode("update")
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint is not None:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def read_intervals(spark: SparkSession, state_path: str) -> DataFrame:
    """The current coalesced islands (layout columns dropped)."""
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)
