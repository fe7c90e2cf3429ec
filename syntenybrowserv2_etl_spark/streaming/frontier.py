"""Streaming Pareto-frontier maintenance — q130's operator kept current
incrementally.

Why this fold is almost free: the frontier is MONOTONE state — merging a
batch can only remove old frontier points (newly dominated) or add new
ones; points dominated once are dominated forever, so the stored state is
just the current frontier (bounded by the frontier's own size, never the
stream's row count) and the fold is

    new_frontier = skyline(stored_frontier ∪ skyline(batch))

which is exact because dominance is transitive: any point of the
accumulated input that the true frontier contains survives both sweeps,
and any point either sweep drops is dominated by a retained point.

State discipline = the engine's versioned fold (heavy_hitters_stream /
cusum_fold_batch pattern): read the last committed ``__v``, write
``__v=batch_id``, ``_batches/<id>`` marker LAST, prune old versions; a
committed redelivery is skipped (marker or pruned watermark), a
crash-window replay recomputes the same deterministic fold from the
still-committed previous version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.skyline import pareto_frontier


def skyline_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    x_col: str,
    y_col: str,
) -> None:
    """One micro-batch of the frontier fold (module docstring)."""
    from .events import _committed_version, _prune_versions
    from ..sources.io import batch_is_committed

    spark = batch_df.sparkSession
    vstar, fs, hp = _committed_version(spark, state_path, "frontier")
    marker_p = hp(f"{state_path}/_batches/{batch_id}")
    if batch_is_committed(spark, state_path, batch_id):
        return
    cand = pareto_frontier(batch_df, x_col, y_col)
    if vstar is not None:
        prev = spark.read.parquet(f"{state_path}/frontier/__v={vstar}")
        cand = prev.unionByName(cand)
    merged = pareto_frontier(cand, x_col, y_col).localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(
        f"{state_path}/frontier/__v={batch_id}"
    )
    fs.mkdirs(marker_p)
    _prune_versions(fs, hp, state_path, "frontier", keep=batch_id)


def skyline_stream(
    stream_df: DataFrame,
    state_path: str,
    x_col: str,
    y_col: str,
    query_name: str = "skyline_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``skyline_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        skyline_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            x_col=x_col,
            y_col=y_col,
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


def read_frontier(spark: SparkSession, state_path: str) -> DataFrame:
    """The current frontier (last committed version). Raises
    ``FileNotFoundError`` when no version has committed yet — fold at
    least one batch first (the schema lives with the data, so there is
    no frame to return before then)."""
    from .events import _committed_version

    vstar, _, _ = _committed_version(spark, state_path, "frontier")
    if vstar is None:
        raise FileNotFoundError(
            f"skyline state at {state_path}: no committed version yet"
        )
    return spark.read.parquet(f"{state_path}/frontier/__v={vstar}")
