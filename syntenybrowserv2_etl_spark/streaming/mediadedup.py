"""Streaming media-ingest near-dup gate (round 15, VERDICT r14 #6;
video leg round 16, VERDICT r15 #3): q169/q170's perceptual-hash band
index — and q175's video frame-fingerprint index — maintained
incrementally, so image/audio/video near-duplicate detection runs at
the ingest door like q119's text twin — every arriving micro-batch is
probed against everything admitted so far WITHOUT re-scanning the
corpus. Image/audio state is the 4-band Hamming index described below;
video state is (frame fingerprint, media_id) rows keyed by the exact
fingerprint (see ``_video_fold_batch`` / ``read_video_dup_pairs``).

State is the banded hash index: one row per (band index ``bi``, 16-bit
band value ``bv``, ``media_id``) with the full 64-bit hash alongside,
bucketed by ``pmod(hash(bi, bv))`` via ``spans.touched_bucket_fold``
(staged rename-swap, marker-last, watermark skip — the engine's one
incremental-state protocol). Per batch:

1. committed-batch redelivery → skip (marker check; the batch's pair
   file landed before the sentinel, so nothing is lost or doubled);
2. decode + hash the batch (image_dhash / audio_envelope_hash — REAL
   Arrow-batched decode, map-only);
3. inside the fold's ``merge_fn`` — where ``touched_bucket_fold`` has
   already HEALED any partial swap and handed over the live pre-state
   of exactly the touched buckets — probe that pre-state for
   Hamming-≤``max_hamming`` pairs (bucket-PRUNED by construction: the
   fold reads only the batch's own (bi, bv) buckets, so per-batch cost
   is O(batch keys · bucket size), never O(index)) plus the
   within-batch pairs via the shared ``multimodal.hamming_band_pairs``,
   and write them to ``{pairs}/__ingest_batch=<id>`` (idempotent
   overwrite, ordered BEFORE the staged write and sentinel — a
   crash-and-recompute replay re-runs the merge against the identical
   healed pre-state and overwrites identically; running the probe
   outside the fold would race the swap's two-rename window and could
   permanently drop a bucket's cross pairs);
4. the merge returns pre ∪ batch band rows (key-dedup) as the new
   bucket contents; the fold's marker landing is the batch's commit
   sentinel.

Exactness invariant (fold ≡ batch, pinned in tests): after any batch
split, the DISTINCT union of emitted pairs equals
``hamming_band_pairs`` over the whole corpus in one shot — pair
emission is order-insensitive because every cross-batch pair (a, b) is
found exactly when the later side arrives and the earlier side is
already indexed, and banding is pigeonhole-complete at radius ≤ 2. The
gate REPORTS pairs rather than silently dropping rows (the q157
dup-flow posture): downstream admission keeps, e.g., the smaller
media_id of each pair — a deterministic read-time rule, not hidden
ingest state.

Reference scope note: the reference ETL (1,290 LoC of sqlite3 loaders)
has no media or streaming surface; this module belongs to the
LLM-pipeline families the brief adds (multimodal near-dup dedup at the
ingest door).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm
from .spans import touched_bucket_fold

_LAYOUT_COLS = ("__kb", "__b")

PAIR_SCHEMA = "media_id_a long, media_id_b long, hamming int"

# Video pairs are emitted at (pair, shared fingerprint) granularity —
# the fp column IS the exactness device: a media_id whose fingerprints
# arrive split across batches emits partial pair rows that DISTINCT
# re-unifies, so read_video_dup_pairs' per-pair count is exact under any
# batch split (a count emitted at pair granularity would double or
# fragment instead).
VIDEO_PAIR_SCHEMA = "media_id_a long, media_id_b long, fp long"

# Hamming-tolerant video pairs are emitted at (pair, near frame-hash
# combo) granularity — the (ha, hb) columns are the same exactness
# device as VIDEO_PAIR_SCHEMA's fp: DISTINCT across batch files
# re-unifies combos re-found under redelivery or batch splits, so
# read_video_hamming_pairs' n_near is exact under any split.
VIDEO_HAMMING_PAIR_SCHEMA = (
    "media_id_a long, media_id_b long, ha long, hb long, hamming int"
)


def _hashes(batch_df: DataFrame, kind: str) -> DataFrame:
    """(media_id, hsh, b0..b3) for the batch via the REAL decode+hash."""
    if kind == "image":
        hs = mm.image_dhash(batch_df)
        hcol = "dhash"
    elif kind == "audio":
        hs = mm.audio_envelope_hash(batch_df)
        hcol = "ahash"
    else:
        raise ValueError(f"unsupported media kind {kind!r}")
    return hs.select(
        "media_id", F.col(hcol).alias("hsh"), "b0", "b1", "b2", "b3"
    )


def _band_rows(hashes: DataFrame) -> DataFrame:
    """Explode each hash row into its four (bi, bv) index rows."""
    return hashes.select(
        "media_id",
        "hsh",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("bi", "bv"),
    ).select("bi", "bv", "media_id", "hsh")


def media_neardup_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    pairs_path: str,
    kind: str = "image",
    n_buckets: int = 16,
    max_hamming: int = 2,
    max_bucket: int | None = None,
) -> None:
    """One micro-batch of the media near-dup gate (module docstring).

    ``kind="video"`` (round 16, VERDICT r15 #3) folds q175's batch shape:
    state is one row per (frame fingerprint ``fp``, ``media_id``) from
    the real APNG decode (``video_scene_changes``' shared dHash kernel),
    buckets keyed by ``fp`` itself — EXACT fingerprint equality, q175's
    contract, so ``max_hamming`` does not apply; the Hamming-tolerant
    variant is ``kind="video_hamming"`` (round 17 — q178's streaming
    twin, ``_video_hamming_fold_batch``: banded per-frame hashes, combo
    granularity, the full occupancy guard).
    Pairs are written as (media_id_a, media_id_b, fp) triples; see
    ``VIDEO_PAIR_SCHEMA`` for why the triple granularity is what makes
    fold ≡ batch hold, and ``read_video_dup_pairs`` for the q175-shaped
    (pair, n_shared) readout.

    ``max_bucket`` (round 17, VERDICT r16 #3) forwards the band-occupancy
    guard the batch pair join got in round 16
    (``multimodal.hamming_band_pairs(max_bucket=)``): without it, a hot
    (band, value) bucket ACCUMULATED IN STATE by a structured hash
    population makes every later batch's probe of that bucket
    O(batch-keys-in-bucket x bucket size) with an unbounded bucket —
    per-batch cost grows with the index instead of staying flat. With
    the cap, (bi, bv) buckets whose TOTAL occupancy (state + batch,
    distinct media) exceeds ``max_bucket`` are excluded from pair
    generation — both within-batch and cross — while the STATE still
    indexes their rows (the cap shapes probing, never what is
    remembered, so raising the cap later restores recall for future
    arrivals). Per-batch probe cost is then O(batch keys x max_bucket).
    Semantics vs the batch operator (monotone sandwich, pinned in
    tests/test_streaming.py): bucket occupancy only grows as batches
    fold, so any bucket under the cap at full-corpus time was under it
    at every earlier batch — the capped fold's pair set is a SUPERSET of
    one-shot ``hamming_band_pairs(corpus, max_bucket=...)`` and a subset
    of the uncapped exact set; with no over-cap buckets all three
    coincide (the existing fold ≡ batch invariant). Like ``max_hamming``,
    the knob applies to the banded-Hamming kinds only; ``kind="video"``
    (exact-fingerprint counting, where skipping a bucket would silently
    undercount n_shared rather than drop redundant candidates) refuses
    it."""
    if max_bucket is not None and max_bucket < 1:
        raise ValueError(f"max_bucket must be >= 1, got {max_bucket}")
    if max_bucket is not None and kind == "video":
        raise ValueError(
            "max_bucket applies to the banded-Hamming kinds (image/audio); "
            "the video kind counts EXACT shared fingerprints, where "
            "skipping a hot fp bucket would undercount n_shared instead "
            "of dropping redundant candidates"
        )
    spark = batch_df.sparkSession
    from ..sources.io import batch_is_committed

    if batch_is_committed(spark, state_path, batch_id):
        # pairs for this batch landed before the sentinel — recomputing
        # them now would probe the POST-fold index (the batch would
        # collide with itself); skip entirely.
        return
    if kind == "video":
        _video_fold_batch(
            batch_df,
            batch_id,
            state_path=state_path,
            pairs_path=pairs_path,
            n_buckets=n_buckets,
        )
        return
    if kind == "video_hamming":
        _video_hamming_fold_batch(
            batch_df,
            batch_id,
            state_path=state_path,
            pairs_path=pairs_path,
            n_buckets=n_buckets,
            max_hamming=max_hamming,
            max_bucket=max_bucket,
        )
        return
    hashes = _hashes(batch_df, kind).localCheckpoint(eager=True)
    bands = _band_rows(hashes)

    def _pair_cols(left: DataFrame) -> DataFrame:
        return (
            left.filter(F.col("media_id") != F.col("__mid2"))
            .select(
                F.least("media_id", "__mid2").alias("media_id_a"),
                F.greatest("media_id", "__mid2").alias("media_id_b"),
                F.bit_count(F.col("hsh").bitwiseXOR(F.col("__h2")))
                .cast("int")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        # Runs AFTER the fold has healed any partial swap: ``pre`` is
        # the authoritative live content of exactly the touched buckets
        # — the complete, bucket-pruned probe set. Pair computation and
        # the idempotent pair-file write live HERE so a crash-and-
        # recompute replay sees the identical pre-state (probing
        # outside the fold races the swap's two-rename window).
        part_probe, pre_probe = part, pre
        if max_bucket is not None:
            # occupancy guard (docstring): exclude (bi, bv) buckets whose
            # TOTAL occupancy (state + batch, distinct media) exceeds the
            # cap from pair generation. The hot set is tiny (distinct
            # over-cap keys) — both exclusions are broadcast anti-joins.
            combined = (
                part if pre is None else part.unionByName(pre)
            ).dropDuplicates(["bi", "bv", "media_id"])
            hot = (
                combined.groupBy("bi", "bv")
                .agg(F.count(F.lit(1)).alias("__occ"))
                .filter(F.col("__occ") > max_bucket)
                .select("bi", "bv")
            )
            part_probe = part.join(F.broadcast(hot), ["bi", "bv"], "left_anti")
            if pre is not None:
                pre_probe = pre.join(
                    F.broadcast(hot), ["bi", "bv"], "left_anti"
                )
        if max_bucket is None:
            within = mm.hamming_band_pairs(
                hashes, "media_id", "hsh", max_hamming
            )
        else:
            # capped within-batch pairs from the guarded band rows (the
            # uncapped path keeps the original whole-batch kernel; here
            # occupancy is a corpus property, so pairs must come from the
            # same guarded buckets the cross probe uses)
            within = _pair_cols(
                part_probe.join(
                    part_probe.select(
                        "bi",
                        "bv",
                        F.col("media_id").alias("__mid2"),
                        F.col("hsh").alias("__h2"),
                    ),
                    ["bi", "bv"],
                )
            )
        if pre is not None:
            cross = _pair_cols(
                part_probe.join(
                    pre_probe.select(
                        "bi",
                        "bv",
                        F.col("media_id").alias("__mid2"),
                        F.col("hsh").alias("__h2"),
                    ),
                    ["bi", "bv"],
                )
            )
            pairs = within.unionByName(cross).distinct()
        else:
            pairs = within
        # coalesce(1) guarantees a schema-bearing file even when the
        # pair set is empty
        pairs.coalesce(1).write.mode("overwrite").parquet(
            f"{pairs_path}/__ingest_batch={batch_id}"
        )
        if pre is None:
            return part
        return pre.unionByName(part).dropDuplicates(["bi", "bv", "media_id"])

    touched_bucket_fold(
        bands,
        batch_id,
        path=state_path,
        key_cols=["bi", "bv"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def _video_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    pairs_path: str,
    n_buckets: int,
) -> None:
    """Video leg of the gate: fold (fp, media_id) frame-fingerprint rows
    with the identical touched-bucket discipline. The merge probes the
    healed pre-state of exactly the batch's own fp buckets (per-batch
    cost O(batch fps · bucket size), never O(index)) and writes the
    batch's (a, b, fp) triples before the staged write + sentinel — the
    same crash-mid-swap ordering the image/audio leg pins."""
    fps = (
        mm.video_scene_changes(batch_df)
        .select("media_id", F.col("dhash").alias("fp"))
        .distinct()
        .select("fp", "media_id")
        .localCheckpoint(eager=True)
    )

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        a = fps.select(F.col("media_id").alias("media_id_a"), "fp")
        b = fps.select(F.col("media_id").alias("media_id_b"), "fp")
        within = a.join(b, "fp").filter(
            F.col("media_id_a") < F.col("media_id_b")
        ).select("media_id_a", "media_id_b", "fp")
        if pre is not None:
            cross = (
                part.join(
                    pre.select("fp", F.col("media_id").alias("__mid2")), "fp"
                )
                .filter(F.col("media_id") != F.col("__mid2"))
                .select(
                    F.least("media_id", "__mid2").alias("media_id_a"),
                    F.greatest("media_id", "__mid2").alias("media_id_b"),
                    "fp",
                )
                .distinct()
            )
            pairs = within.unionByName(cross).distinct()
        else:
            pairs = within
        pairs.coalesce(1).write.mode("overwrite").parquet(
            f"{pairs_path}/__ingest_batch={batch_id}"
        )
        if pre is None:
            return part
        return pre.unionByName(part).dropDuplicates(["fp", "media_id"])

    touched_bucket_fold(
        fps,
        batch_id,
        path=state_path,
        key_cols=["fp"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def _video_hamming_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    state_path: str,
    pairs_path: str,
    n_buckets: int,
    max_hamming: int,
    max_bucket: int | None,
) -> None:
    """Hamming-TOLERANT video leg (round 17, VERDICT r16 #4 — the
    streaming twin of ``multimodal.video_neardup_hamming_pairs``):
    state is the image leg's banded index but over per-FRAME dHashes —
    one row per (band index, band value, media_id, frame hash), keyed
    and bucketed by (bi, bv) — so a media can hold many hashes and the
    state dedup key must include the hash. Pairs are written at
    (pair, ha, hb, hamming) granularity (``VIDEO_HAMMING_PAIR_SCHEMA``
    — the fp-column exactness device generalized to combos), probed
    from the healed pre-state exactly like the image leg, with the same
    ``max_bucket`` occupancy guard (total state+batch occupancy per
    band bucket) and the same monotone-sandwich semantics under it.
    ``read_video_hamming_pairs`` groups the distinct combos to q178's
    (pair, n_near) shape; fold ≡ batch because a cross-batch near combo
    is found when the later frame hash arrives and banding is
    pigeonhole-complete at radius ≤ 2."""
    if max_hamming > 2:
        raise ValueError(
            "4-band bucketing is only pigeonhole-complete for Hamming <= 2"
        )
    fps = (
        mm.video_scene_changes(batch_df)
        .select("media_id", F.col("dhash").alias("hsh"))
        .distinct()
    )
    # the shared band convention, in one place: dhash_bands re-derives
    # b0..b3 from the packed hash, _band_rows explodes them into the
    # index rows — bit-for-bit the batch operator's stage
    bands = _band_rows(mm.dhash_bands(fps, "hsh")).localCheckpoint(
        eager=True
    )

    def _combo_cols(left: DataFrame) -> DataFrame:
        # ordered (a, b) with the hash columns following the same
        # assignment, so a combo is one row regardless of probe side
        a_first = F.col("media_id") < F.col("__mid2")
        return (
            left.filter(F.col("media_id") != F.col("__mid2"))
            .select(
                F.least("media_id", "__mid2").alias("media_id_a"),
                F.greatest("media_id", "__mid2").alias("media_id_b"),
                F.when(a_first, F.col("hsh")).otherwise(F.col("__h2")).alias("ha"),
                F.when(a_first, F.col("__h2")).otherwise(F.col("hsh")).alias("hb"),
                F.bit_count(F.col("hsh").bitwiseXOR(F.col("__h2")))
                .cast("int")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            .distinct()
        )

    def merge(pre: DataFrame | None, part: DataFrame) -> DataFrame:
        part_probe, pre_probe = part, pre
        if max_bucket is not None:
            combined = (
                part if pre is None else part.unionByName(pre)
            ).dropDuplicates(["bi", "bv", "media_id", "hsh"])
            hot = (
                combined.groupBy("bi", "bv")
                .agg(F.count(F.lit(1)).alias("__occ"))
                .filter(F.col("__occ") > max_bucket)
                .select("bi", "bv")
            )
            part_probe = part.join(F.broadcast(hot), ["bi", "bv"], "left_anti")
            if pre is not None:
                pre_probe = pre.join(
                    F.broadcast(hot), ["bi", "bv"], "left_anti"
                )
        rhs = ["bi", "bv", F.col("media_id").alias("__mid2"),
               F.col("hsh").alias("__h2")]
        within = _combo_cols(
            part_probe.join(part_probe.select(*rhs), ["bi", "bv"])
        )
        if pre is not None:
            cross = _combo_cols(
                part_probe.join(pre_probe.select(*rhs), ["bi", "bv"])
            )
            pairs = within.unionByName(cross).distinct()
        else:
            pairs = within
        pairs.coalesce(1).write.mode("overwrite").parquet(
            f"{pairs_path}/__ingest_batch={batch_id}"
        )
        if pre is None:
            return part
        return pre.unionByName(part).dropDuplicates(
            ["bi", "bv", "media_id", "hsh"]
        )

    touched_bucket_fold(
        bands,
        batch_id,
        path=state_path,
        key_cols=["bi", "bv"],
        merge_fn=merge,
        n_buckets=n_buckets,
    )


def read_video_hamming_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """q178-shaped readout of the Hamming-tolerant video gate: distinct
    (a, b, ha, hb) combos across all batch files, counted per pair —
    equals one-shot ``video_neardup_hamming_pairs`` over everything
    folded (fold ≡ batch at combo granularity, so frames split across
    batches cannot double or fragment n_near). Output: (media_id_a,
    media_id_b, n_near)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(pairs_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if (
        not fs.exists(hpath(pairs_path))
        or not fs.globStatus(hpath(f"{pairs_path}/__ingest_batch=*"))
    ):
        combos = spark.createDataFrame([], VIDEO_HAMMING_PAIR_SCHEMA)
    else:
        combos = (
            spark.read.option("basePath", pairs_path)
            .parquet(f"{pairs_path}/__ingest_batch=*")
            .drop("__ingest_batch")
            .distinct()
        )
    return combos.groupBy("media_id_a", "media_id_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_near")
    )


def read_video_dup_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """q175-shaped readout of the video gate: distinct (a, b, fp)
    triples across all batch files, counted per pair — equals the
    one-shot q175 join over everything folded (fold ≡ batch at the
    triple granularity, so a media_id split across batches cannot double
    or fragment a pair's n_shared). Output: (media_id_a, media_id_b,
    n_shared)."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(pairs_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if (
        not fs.exists(hpath(pairs_path))
        or not fs.globStatus(hpath(f"{pairs_path}/__ingest_batch=*"))
    ):
        triples = spark.createDataFrame([], VIDEO_PAIR_SCHEMA)
    else:
        triples = (
            spark.read.option("basePath", pairs_path)
            .parquet(f"{pairs_path}/__ingest_batch=*")
            .drop("__ingest_batch")
            .distinct()
        )
    return triples.groupBy("media_id_a", "media_id_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared")
    )


def media_neardup_stream(
    stream_df: DataFrame,
    state_path: str,
    pairs_path: str,
    kind: str = "image",
    n_buckets: int = 16,
    max_hamming: int = 2,
    max_bucket: int | None = None,
    query_name: str = "media_neardup_gate",
    checkpoint: str | None = None,
):
    """foreachBatch twin of ``media_neardup_fold_batch``."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        media_neardup_fold_batch(
            batch_df,
            int(batch_id),
            state_path=state_path,
            pairs_path=pairs_path,
            kind=kind,
            n_buckets=n_buckets,
            max_hamming=max_hamming,
            max_bucket=max_bucket,
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


def read_media_index(spark: SparkSession, state_path: str) -> DataFrame:
    """The maintained band index ``(bi, bv, media_id, hsh)``."""
    return spark.read.parquet(state_path).drop(*_LAYOUT_COLS)


def read_dup_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All emitted pairs, distinct — equals the one-shot
    ``hamming_band_pairs`` over everything folded (the gate's fold ≡
    batch invariant; a redelivered-in-two-batches media_id can emit a
    pair twice across batch files, which distinct collapses). An empty
    or never-written pairs directory reads as zero pairs, not an
    error — callers may poll the gate's output before the first batch
    lands."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    fs = hpath(pairs_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if (
        not fs.exists(hpath(pairs_path))
        or not fs.globStatus(hpath(f"{pairs_path}/__ingest_batch=*"))
    ):
        return spark.createDataFrame([], PAIR_SCHEMA)
    return (
        spark.read.option("basePath", pairs_path)
        .parquet(f"{pairs_path}/__ingest_batch=*")
        .drop("__ingest_batch")
        .distinct()
    )
