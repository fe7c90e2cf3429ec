"""Incremental exact-substring dedup: streaming shingle-count state + a
per-batch repeated-span report.

The batch operator (``operators/dedup.repeated_spans``, q142) answers
"which spans repeat anywhere in the corpus" with a full-corpus shingle
count. A continuously-ingested corpus wants the same answer per arriving
micro-batch WITHOUT rescanning history — the exact-substring analogue of
the bloom incremental dedup (``dedup.bloom_*``, q72), but exact-counted
rather than approximate-membership:

  - STATE: per 64-bit shingle hash, its total occurrence count across
    everything folded so far — ``(__h, c)`` rows partitioned by
    ``pmod(hash(__h), n_buckets)`` and maintained by
    ``spans.touched_bucket_fold`` (the engine's ONE marker/watermark/
    rename-swap state discipline; counts are a NON-idempotent merge, so
    the fold's exactly-once-in-effect contract is load-bearing). A batch
    pre-reduces to its own (hash, count) frame — bounded by the batch's
    distinct-shingle count — before touching state.
  - REPORT (``batch_repeated_report``): for a batch NOT yet folded,
    a position is repeated iff state_count + within-batch count ≥ 2 —
    exactly ``repeated_spans(prior ∪ batch, exact=False)`` restricted to
    the batch's documents (pinned by the fold-≡-batch test). One
    equi-join of the batch's shingle hashes against state (8-byte keys);
    the corpus is never rescanned.

Keying is by the 64-bit hash (``repeated_spans(exact=False)``'s
documented production trade — state stays 16 bytes/shingle; collision
odds on the operator docstring). Per-batch cost: O(batch shingles) +
O(touched partitions) state I/O, flat in accumulated corpus size — the
drift monitor's curve discipline (SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _coalesce_marked, shingle_positions
from .spans import touched_bucket_fold

_LAYOUT_COLS = ("__kb", "__b")


def _batch_shingle_counts(
    batch_df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    return (
        shingle_positions(batch_df, text_col, id_col, k)
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def shingle_counts_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = 64,
) -> None:
    """One micro-batch of shingle-count state maintenance (module
    docstring). Counts sum — non-idempotent — so redelivery safety rides
    entirely on the fold's marker/watermark/lost-marker machinery."""
    reduced = _batch_shingle_counts(batch_df, text_col, id_col, k)

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        if pre is None:
            return part
        return (
            pre.unionByName(part).groupBy("__h").agg(F.sum("c").alias("c"))
        )

    touched_bucket_fold(
        reduced,
        batch_id,
        path=state_path,
        key_cols=["__h"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def shingle_counts_stream(
    stream_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_buckets: int = 64,
    query_name: str = "shingle_counts_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``shingle_counts_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        shingle_counts_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            text_col=text_col,
            id_col=id_col,
            k=k,
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


def read_shingle_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained counts ``(__h, c)`` (layout columns dropped)."""
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)


def batch_repeated_report(
    batch_df: DataFrame,
    state_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
) -> DataFrame:
    """Repeated spans of a NOT-YET-FOLDED batch against the accumulated
    corpus: ``(id, span_start, span_end, span_tokens)`` per maximal span
    covered by a ≥k-token substring occurring ≥2 times in prior-state ∪
    batch (``repeated_spans(exact=False)`` semantics restricted to the
    batch's documents — pinned by the equivalence test). Run it before
    ``shingle_counts_fold_batch`` of the same batch; the excision or
    quarantine decision it feeds is the caller's."""
    spark = batch_df.sparkSession
    sh = shingle_positions(batch_df, text_col, id_col, k)
    batch_counts = sh.groupBy("__h").agg(F.count(F.lit(1)).alias("__cb"))
    # explicit existence probe, NOT try/except around the read: a corrupt
    # or permission-broken state must surface as an error, never silently
    # degrade into an empty-state report that misses every prior duplicate
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(state_path).getFileSystem(spark._jsc.hadoopConfiguration())
    state = None
    if fs.exists(hpath(state_path)) and fs.globStatus(
        hpath(f"{state_path}/__kb=*")
    ):
        state = read_shingle_counts(spark, state_path).select(
            "__h", F.col("c").alias("__cs")
        )
    if state is not None:
        tot = batch_counts.join(state, "__h", "left").select(
            "__h",
            (F.col("__cb") + F.coalesce(F.col("__cs"), F.lit(0))).alias(
                "__ct"
            ),
        )
    else:
        tot = batch_counts.select("__h", F.col("__cb").alias("__ct"))
    rep = tot.filter(F.col("__ct") >= 2).select("__h")
    marked = sh.join(rep, "__h").select(id_col, "pos")
    return _coalesce_marked(marked, id_col, k)
