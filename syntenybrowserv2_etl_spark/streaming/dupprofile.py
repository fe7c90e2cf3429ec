"""Streaming duplication-profile maintenance: the corpus's exact-dup
cluster structure as keyed fold state, with live histogram / effective-
sample-size reports.

The batch diagnostics (``dedup.dup_size_histogram`` q141,
``dedup.effective_sample_size`` q158) re-scan the corpus; continuous
ingestion wants them maintained — "after this micro-batch, how
duplicated is everything admitted so far, and what is each source's
duplication-adjusted budget?" State is per-(content key, source) doc
COUNTS keyed by the engine's exact-dup identity (the 40-bit md5 of
normalized text + its length — q22's key), bucketed by
``pmod(hash(key))`` via ``spans.touched_bucket_fold`` (staged
rename-swap, marker-last, watermark skip). Merge is a SUM — the
non-idempotent case the fold's sentinel discipline covers. Per-batch
cost is O(batch's distinct contents); reports read state only, never
text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import hashing
from ..operators.dedup import normalize_text
from .spans import touched_bucket_fold

_LAYOUT_COLS = ("__kb", "__b")


def _reduced(batch_df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    norm = normalize_text(text_col)
    return (
        batch_df.select(
            hashing.md5_long(norm).alias("k"),
            F.length(norm).alias("len"),
            F.col(group_col).alias("g"),
        )
        .groupBy("k", "len", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dup_counts_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    text_col: str = "text",
    group_col: str = "source",
    n_buckets: int = 64,
) -> None:
    """Fold one micro-batch's per-(content, source) doc counts into state."""
    reduced = _reduced(batch_df, text_col, group_col)

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        if pre is None:
            return part
        return (
            pre.unionByName(part)
            .groupBy("k", "len", "g")
            .agg(F.sum("c").alias("c"))
        )

    touched_bucket_fold(
        reduced,
        batch_id,
        path=state_path,
        key_cols=["k", "len", "g"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def dup_counts_stream(
    stream_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    group_col: str = "source",
    n_buckets: int = 64,
    query_name: str = "dup_counts_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``dup_counts_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        dup_counts_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            text_col=text_col,
            group_col=group_col,
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


def _state(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)


def dup_histogram_report(spark: SparkSession, state_path: str) -> DataFrame:
    """``dedup.dup_size_histogram`` of everything folded so far, from
    state counts only — identical output shape
    ``(cluster_size, n_clusters, n_docs, doc_share R6)``."""
    sizes = (
        _state(spark, state_path)
        .groupBy("k", "len")
        .agg(F.sum("c").alias("cluster_size"))
    )
    hist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )
    total = hist.agg(F.sum("n_docs").alias("__total"))
    return hist.crossJoin(F.broadcast(total)).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs") / F.col("__total"), 6).alias("doc_share"),
    )


def effective_size_report(
    spark: SparkSession, state_path: str, group_col: str = "source"
) -> DataFrame:
    """``dedup.effective_sample_size`` of everything folded so far, from
    state counts: per group, Σw = Σ c/s and Σw² = Σ c/s² over its
    clusters (s = GLOBAL cluster size). Identical output shape
    ``(group, n_docs, sum_w R6, ess R6, dup_discount R6)``."""
    st = _state(spark, state_path)
    sizes = st.groupBy("k", "len").agg(F.sum("c").alias("s"))
    joined = st.join(sizes, ["k", "len"]).select(
        "g",
        "c",
        (F.lit(1.0) / F.col("s")).alias("w"),
    )
    return (
        joined.groupBy("g")
        .agg(
            F.sum("c").alias("n_docs"),
            F.sum(F.col("c") * F.col("w")).alias("__sw"),
            F.sum(F.col("c") * F.col("w") * F.col("w")).alias("__sw2"),
        )
        .select(
            F.col("g").alias(group_col),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round("__sw", 6).alias("sum_w"),
            F.round(F.col("__sw") * F.col("__sw") / F.col("__sw2"), 6).alias("ess"),
            F.round(F.col("__sw") / F.col("n_docs"), 6).alias("dup_discount"),
        )
    )
