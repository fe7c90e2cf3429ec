"""Streaming corpus-drift monitor: maintained reference token counts +
per-batch KL report.

The batch-side tripwire (``operators/drift.unigram_kl``) compares two
static slices; continuous ingestion wants the reference side MAINTAINED
— "score this micro-batch against everything admitted so far (or against
a pinned golden corpus) without re-scanning it". Two pieces, both riding
machinery this engine already hardened:

  - ``token_counts_fold_batch`` — keyed-state fold of the corpus unigram
    counts: state is ``(token, c)`` parquet-bucketed by
    ``pmod(hash(token), n_buckets)`` via ``spans.touched_bucket_fold``
    (staged rename-swap, marker-last, watermark skip, lost-marker
    detection). The merge is a SUM — non-idempotent under naive replay,
    which is exactly the case the fold's sentinel discipline exists for.
    Per-batch cost is O(batch vocabulary) buckets touched, flat in
    corpus size.
  - ``batch_drift_report`` — KL(batch ‖ reference) from the counts:
    the batch reduces to its own ``(token, c)`` frame, the reference
    counts are read bucket-complete from state, and
    ``operators/drift.kl_from_counts`` scores them. No text in the
    reference path is ever re-scanned.

A rising ``kl_total`` across batches is the drift alarm; the attribution
rows name the tokens driving it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.drift import _token_counts, kl_from_counts
from .spans import touched_bucket_fold

_LAYOUT_COLS = ("__kb", "__b")


def token_counts_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    text_col: str = "text",
    n_buckets: int = 64,
) -> None:
    """One micro-batch of reference token-count maintenance (module
    docstring). The batch pre-reduces to its own ``(token, c)`` frame —
    bounded by the batch's vocabulary — before touching state."""
    reduced = _token_counts(batch_df, text_col)

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        if pre is None:
            return part
        return (
            pre.unionByName(part)
            .groupBy("token")
            .agg(F.sum("c").alias("c"))
        )

    touched_bucket_fold(
        reduced,
        batch_id,
        path=state_path,
        key_cols=["token"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def token_counts_stream(
    stream_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    n_buckets: int = 64,
    query_name: str = "token_counts_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``token_counts_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        token_counts_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            text_col=text_col,
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


def read_token_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained reference counts ``(token, c)`` (layout dropped)."""
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)


def batch_drift_report(
    batch_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """KL(batch ‖ maintained reference) with top-k token attribution —
    ``operators/drift.unigram_kl`` semantics, reference side served from
    state counts instead of re-scanned text."""
    spark = batch_df.sparkSession
    return kl_from_counts(
        _token_counts(batch_df, text_col),
        read_token_counts(spark, state_path),
        top_k,
    )


def value_counts_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    value_col,
    value_name: str = "v",
    n_buckets: int = 16,
) -> None:
    """Distribution-shape sibling of ``token_counts_fold_batch``: maintain
    the reference HISTOGRAM of an integer-valued column (e.g. document
    length) as keyed fold state — ``(v, c)`` bucketed by pmod(hash(v)).
    The batch pre-reduces to its own value counts (bounded by the value
    domain) before touching state; merge is the same non-idempotent SUM
    the fold's sentinel discipline covers."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    reduced = (
        batch_df.select(v.cast("long").alias(value_name))
        .groupBy(value_name)
        .agg(F.count(F.lit(1)).alias("c"))
    )

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        if pre is None:
            return part
        return (
            pre.unionByName(part)
            .groupBy(value_name)
            .agg(F.sum("c").alias("c"))
        )

    touched_bucket_fold(
        reduced,
        batch_id,
        path=state_path,
        key_cols=[value_name],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def value_counts_stream(
    stream_df: DataFrame,
    state_path: str,
    value_col: str,
    value_name: str = "v",
    n_buckets: int = 16,
    query_name: str = "value_counts_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``value_counts_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        value_counts_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            value_col=value_col,
            value_name=value_name,
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


def batch_ks_report(
    batch_df: DataFrame,
    state_path: str,
    value_col,
    value_name: str = "v",
) -> DataFrame:
    """Exact two-sample KS of THIS batch's value distribution against the
    maintained reference histogram (``operators/drift.ks_from_counts`` —
    q149's statistic with the reference side served from state, never
    re-scanned). One row: ``(n_p, n_q, ks, ks_at)`` — a rising ``ks``
    across batches is the shape-drift alarm the token-KL report can't
    see (KL is insensitive to e.g. a pure length shift)."""
    from ..operators.drift import ks_from_counts

    spark = batch_df.sparkSession
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    cp = (
        batch_df.select(v.cast("long").alias(value_name))
        .groupBy(value_name)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cq = spark.read.parquet(state_path).drop(*_LAYOUT_COLS)
    return ks_from_counts(cp, cq, value_name)
