"""Streaming embedding-health monitor: maintained per-label centroid
state + per-batch collapse / cohesion / label-suspect reports.

The batch-side audits (q162 collapse, q163/q167 label noise, q164
separation, q165 cohesion) each scan a static corpus; continuous
ingestion wants the class geometry MAINTAINED — "score this micro-batch
against everything admitted so far without re-scanning it". This is the
round-14 streaming twin of the q162–q167 family (VERDICT r13 next-round
#8), riding the same touched-bucket fold discipline as the drift and
merge sinks (``streaming/spans.touched_bucket_fold`` — staged
rename-swap, marker-last idempotent replay, lost-marker detection).

State is the per-label sufficient statistic for a centroid: ``(label,
n, sumvec)`` — labels × dims doubles, parquet-bucketed by
``pmod(hash(label), n_buckets)``. The merge is an elementwise SUM
(non-idempotent under naive replay — exactly what the fold's sentinel
discipline exists for). Per-batch cost is O(batch labels) buckets
touched, flat in corpus size; every report below runs on the
labels-sized state frame or on the batch itself — the admitted corpus
is never re-scanned.

Reports:
  - ``centroid_separation_report`` — q164's between-class centroid
    cosine matrix from state (cosine is scale-invariant, so the raw
    sumvecs serve directly as centroids).
  - ``batch_label_health_report`` — per batch: each row's cosine to its
    OWN label centroid (q165 cohesion, incremental) and the
    argmax-centroid vote (nearest maintained centroid disagrees with
    the row's label ⇒ suspect — the centroid-vote form of q163/q167's
    kNN vote, the O(|labels|) monitor a firehose can afford). Broadcast
    centroid array + narrow argmax, the assign_centroids shape.

Labels must be integral (the deterministic smaller-label tie-break is
numeric, matching q163/q167).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import norm_expr
from .spans import touched_bucket_fold

_LAYOUT_COLS = ("__kb", "__b")


def _label_sums(batch_df: DataFrame, label_col: str, vec_col: str) -> DataFrame:
    """Reduce a batch to its per-label sufficient statistic
    ``(label, n, sumvec)`` — bounded by the batch's label set."""
    flat = batch_df.select(
        F.col(label_col).cast("long").alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "v"),
    )
    sums = (
        flat.groupBy("label", "pos")
        .agg(F.sum(F.col("v").cast("double")).alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("__ps"))
        .select(
            "label", F.transform("__ps", lambda x: x["s"]).alias("sumvec")
        )
    )
    n = batch_df.groupBy(F.col(label_col).cast("long").alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return sums.join(n, "label")


def _merge_sums(pre: DataFrame | None, part: DataFrame) -> DataFrame:
    if pre is None:
        return part
    both = pre.select("label", "n", "sumvec").unionByName(
        part.select("label", "n", "sumvec")
    )
    flat = both.select(
        "label", "n", F.posexplode("sumvec").alias("pos", "s")
    )
    merged = (
        flat.groupBy("label", "pos")
        .agg(F.sum("s").alias("s"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("__ps"))
        .select("label", F.transform("__ps", lambda x: x["s"]).alias("sumvec"))
    )
    counts = both.groupBy("label").agg(F.sum("n").alias("n"))
    return merged.join(counts, "label")


def label_centroid_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_buckets: int = 16,
) -> None:
    """One micro-batch of per-label centroid maintenance (module
    docstring). The batch pre-reduces to (label, n, sumvec) before
    touching state."""
    touched_bucket_fold(
        _label_sums(batch_df, label_col, vec_col),
        batch_id,
        path=state_path,
        key_cols=["label"],
        merge_fn=_merge_sums,
        n_buckets=n_buckets,
    )


def label_centroid_stream(
    stream_df: DataFrame,
    state_path: str,
    label_col: str = "label",
    vec_col: str = "embedding",
    n_buckets: int = 16,
    query_name: str = "label_centroid_fold",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``label_centroid_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        label_centroid_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            label_col=label_col,
            vec_col=vec_col,
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


def read_label_centroids(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained state ``(label, n, sumvec)`` (layout dropped)."""
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)


def centroid_separation_report(centroids: DataFrame) -> DataFrame:
    """q164 from state: centroid cosine for every unordered label pair.
    cos(sum/n_a, sum/n_b) = cos(sum_a, sum_b), so the sumvecs serve
    directly. The pair frame is labels² — state-sized, never corpus."""
    a = centroids.select(
        F.col("label").alias("label_a"),
        F.col("n").alias("n_a"),
        F.col("sumvec").alias("__va"),
        norm_expr(F.col("sumvec")).alias("__na"),
    )
    b = centroids.select(
        F.col("label").alias("label_b"),
        F.col("n").alias("n_b"),
        F.col("sumvec").alias("__vb"),
        norm_expr(F.col("sumvec")).alias("__nb"),
    )
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("__va"), F.col("__vb"), lambda x, y: x * y
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / (F.col("__na") * F.col("__nb")),
                6,
            ).alias("centroid_cos"),
        )
    )


def batch_label_health_report(
    batch_df: DataFrame,
    state_path: str,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score a micro-batch against the maintained class geometry:
    per label, ``(label, n_batch, mean_cos_own R6, n_suspect,
    suspect_rate R6)`` where ``cos_own`` is the row's cosine to its own
    label's maintained centroid (q165's cohesion, incremental) and a row
    is SUSPECT when the nearest maintained centroid carries a different
    label (ties to the smaller label — q163/q167's rule) OR when no vote
    exists at all (empty/absent centroid state — nothing vouches for the
    row, so it counts suspect rather than silently dropping out of the
    NULL-skipping sum; ADVICE r14). ``mean_cos_own`` stays NULL-skipping
    by design: a first-seen label has no maintained centroid yet, so its
    rows contribute no own-cosine (documented, not an undercount — those
    same rows DO count suspect via the coalesce). Centroids ride
    one broadcast array row; the batch never shuffles for scoring."""
    spark = batch_df.sparkSession
    cents = read_label_centroids(spark, state_path)
    cent_arr = F.broadcast(
        cents.agg(
            F.collect_list(
                F.struct(
                    F.col("label").alias("lb"),
                    F.col("sumvec").alias("vec"),
                    norm_expr(F.col("sumvec")).alias("nrm"),
                )
            ).alias("__cents")
        )
    )
    dot = lambda c: F.aggregate(
        F.zip_with(F.col("__v"), c["vec"], lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = F.array_max(
        F.transform(
            F.col("__cents"),
            lambda c: F.struct(
                (dot(c) / (F.col("__vn") * c["nrm"])).alias("sim"),
                (-c["lb"]).alias("neglb"),
            ),
        )
    )
    # F.get (0-indexed) returns NULL when the label has no maintained
    # centroid — ANSI element_at would throw on the empty-state batch
    own_cos = F.get(
        F.transform(
            F.filter(F.col("__cents"), lambda c: c["lb"] == F.col("__own")),
            lambda c: dot(c) / (F.col("__vn") * c["nrm"]),
        ),
        F.lit(0),
    )
    scored = (
        batch_df.select(
            F.col(label_col).cast("long").alias("__own"),
            F.col(vec_col).alias("__v"),
        )
        .withColumn("__vn", norm_expr(F.col("__v")))
        .crossJoin(cent_arr)
        .select(
            "__own",
            own_cos.alias("__oc"),
            (-best["neglb"]).alias("__vote"),
        )
    )
    # NULL vote (empty centroid state) must count suspect, not vanish
    # into NULL-skipping aggregation
    suspect = F.coalesce(F.col("__vote") != F.col("__own"), F.lit(True))
    return scored.groupBy(F.col("__own").alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_batch"),
        F.round(F.avg("__oc"), 6).alias("mean_cos_own"),
        F.sum(suspect.cast("long")).alias("n_suspect"),
        F.round(
            F.sum(suspect.cast("int")) / F.count(F.lit(1)),
            6,
        ).alias("suspect_rate"),
    )
