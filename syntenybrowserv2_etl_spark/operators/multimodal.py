"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBBED (clearly marked below) behind a deterministic fake that
preserves every real Spark-side concern: schema contracts, Arrow batch
shape, ``mapInPandas`` iterator discipline, partition sizing, and metadata
propagation. Swapping the stub for PIL/torchaudio is a one-function change.

Scale posture: binary payloads ride in parquet binary columns; transforms
run as Arrow-batched ``mapInPandas`` so each Python worker sees columnar
batches (spark.sql.execution.arrow.maxRecordsPerBatch bounds memory).
Payload-heavy tables should be written with small row groups and read with
``spark.sql.files.maxPartitionBytes`` sized so one task's batch of decoded
frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes | None, kind: str) -> list[float]:
    """STUB — deterministic fake feature extraction.

    A real deployment replaces this body with e.g. PIL.Image.open +
    resize + channel means (images) or an MFCC frame (audio). The fake
    derives an 8-dim feature from the payload bytes so tests exercise real
    data flow end-to-end deterministically.
    """
    if payload is None:
        return [0.0] * 8
    acc = [0] * 8
    for i, b in enumerate(payload[:4096]):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [float(x) / 997.0 for x in acc]


def decode_real(payload: bytes, kind: str):  # pragma: no cover
    """The real decode seam — not available in this container."""
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this environment; "
        "replace _decode_stub with a real kernel (PIL / torchaudio / pyav)"
    )


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch is a pandas DataFrame of the full media
    schema; output conforms to FEATURE_SCHEMA. Column pruning still applies
    upstream — select only needed columns before calling for payload-light
    passes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"], strict=True)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp.

    The sequence explode is real Spark (native exprs, bounded fan-out =
    duration/every_ms); the per-frame decode is the stubbed kernel above.
    """
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "sample_ms", "codec")
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image-resize pass: payload→payload transform with metadata rewrite.

    The Spark-side contract is the production one: same MEDIA_SCHEMA out as
    in (so resize passes compose with any other media op), width/height
    rewritten to the target, payload replaced by the re-encoded bytes,
    non-images passed through untouched. Arrow-batched ``mapInPandas`` —
    payloads move as columnar binary, never pickled rows.

    STUB kernel: real deployments swap ``_resize_stub`` for PIL
    ``Image.open(...).resize((w, h)).save(buf)``; the fake derives the
    output bytes deterministically from (input bytes, target) so tests pin
    byte-exact behavior without an image library in the container.
    """

    def _resize_stub(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None
        # deterministic fake "re-encode": size scales with target area
        out_len = max(8, min(len(payload), (target_w * target_h) // 512))
        return bytes(
            (b + i) % 256 for i, b in enumerate(payload[:out_len])
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(_resize_stub)
            pdf.loc[is_img, "width"] = target_w
            pdf.loc[is_img, "height"] = target_h
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic in-repo media fixture (no external files needed)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes((i * 7 + j) % 251 for j in range(128 + i))
        rows.append(
            (
                i,
                kind,
                payload,
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                (i + 1) * 500 if kind != "image" else None,
                {"image": "png", "audio": "pcm", "video": "h264"}[kind],
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
