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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG decode (zlib inflate + scanline un-filtering).

    Supports the baseline profile: 8-bit depth, non-interlaced,
    gray / gray+alpha / RGB / RGBA (no palette). Returns
    (width, height, channels, raw pixel bytes row-major).
    """
    import struct
    import zlib

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat = 8, b""
    w = h = channels = None
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            if len(chunk) < 13:
                raise ValueError("truncated PNG IHDR chunk")
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk[:13]
            )
            if w == 0 or h == 0:
                raise ValueError("zero-dimension PNG")
            if depth != 8 or interlace != 0 or ctype == 3:
                raise NotImplementedError(
                    "only 8-bit non-interlaced non-palette PNG supported"
                )
            if ctype not in (0, 2, 4, 6):
                raise ValueError(f"bad PNG color type {ctype}")
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None or channels is None:
        raise ValueError("PNG missing IHDR chunk")
    stride = w * channels
    expected = h * (stride + 1)
    try:
        # Cap inflation at the IHDR-declared pixel volume: a crafted
        # few-KB IDAT must not balloon to gigabytes inside an executor.
        raw = zlib.decompressobj().decompress(idat, expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) > expected:
        raise ValueError("PNG IDAT inflates past declared dimensions")
    if len(raw) < expected:
        raise ValueError("truncated PNG pixel data")
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _y in range(h):
        ft = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if ft == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"bad PNG filter type {ft}")
        out += line
        prev = line
    return w, h, channels, bytes(out)


def _wav_decode(data: bytes) -> tuple[int, int, list[int]]:
    """Pure-stdlib RIFF/WAVE PCM16 decode via struct unpacking.

    Returns (n_channels, sample_rate, interleaved 16-bit samples)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _bps, _block, bits = fmt
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError("only PCM16 WAV supported")
    pcm = pcm[: len(pcm) // 2 * 2]  # a truncated final sample byte is dropped
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return n_ch, rate, samples


def decode_real(payload: bytes, kind: str) -> list[float]:
    """REAL decode kernels — pure stdlib, no external media libraries.

    - PNG (8-bit, non-interlaced, non-palette): full inflate + un-filter,
      feature = [mean of each of up to 4 channels / 255 (absent → 0),
      mean luminance of each image quadrant / 255].
    - WAV (RIFF PCM16): full chunk parse, feature = RMS of 8 equal
      sample segments, normalized by 2^15.

    Anything else (JPEG, h264, ...) raises NotImplementedError — that
    remains the documented seam for containers with the codec libraries
    installed. Same 8-float output contract as ``_decode_stub``, so the
    two kernels are drop-in interchangeable in ``extract_features``.
    """
    if payload is None:
        return [0.0] * 8
    if payload[:8] == _PNG_MAGIC:
        w, h, ch, pix = _png_decode(payload)
        n_px = w * h
        chan_means = [0.0] * 4
        for c in range(ch):
            chan_means[c] = (
                sum(pix[i] for i in range(c, len(pix), ch)) / n_px / 255.0
            )
        # quadrant luminance: mean over the color channels only — alpha is
        # excluded for both gray+alpha (ch=2) and RGBA (ch=4)
        quads = [0.0] * 4
        counts = [0] * 4
        lum_ch = 1 if ch == 2 else min(ch, 3)
        for y in range(h):
            row = y * w * ch
            for x in range(w):
                q = (2 if y >= (h + 1) // 2 else 0) + (
                    1 if x >= (w + 1) // 2 else 0
                )
                px = row + x * ch
                quads[q] += sum(pix[px : px + lum_ch]) / lum_ch
                counts[q] += 1
        return chan_means + [
            (quads[q] / counts[q] / 255.0) if counts[q] else 0.0
            for q in range(4)
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _n_ch, _rate, samples = _wav_decode(payload)
        if not samples:
            return [0.0] * 8
        seg = max(1, len(samples) // 8)
        out = []
        for s in range(8):
            part = samples[s * seg : (s + 1) * seg] or [0]
            rms = (sum(v * v for v in part) / len(part)) ** 0.5
            out.append(rms / 32768.0)
        return out
    raise NotImplementedError(
        "payload is neither PNG nor PCM16 WAV; decoding other containers "
        "needs the real codec libraries (PIL / torchaudio / pyav)"
    )


def extract_features(
    media: DataFrame, batch_size_hint: int = 256, decoder=None
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch is a pandas DataFrame of the full media
    schema; output conforms to FEATURE_SCHEMA. Column pruning still applies
    upstream — select only needed columns before calling for payload-light
    passes.

    ``decoder`` is the per-payload kernel ``(bytes, kind) -> list[float]``;
    default is the deterministic ``_decode_stub`` (oracle-reproducible,
    q40). Pass ``decode_real`` for the working PNG/WAV kernels.
    """
    kernel = decoder or _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                kernel(p, k)
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


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        # integer SUMS, not /255 means: bit-exact cross-engine, so the
        # decode leg itself (inflate + un-filter) is value-checkable
        T.StructField("sum_c0", T.LongType(), True),
        T.StructField("sum_c1", T.LongType(), True),
        T.StructField("sum_c2", T.LongType(), True),
        T.StructField("lum_q0", T.LongType(), True),
        T.StructField("lum_q1", T.LongType(), True),
        T.StructField("lum_q2", T.LongType(), True),
        T.StructField("lum_q3", T.LongType(), True),
    ]
)


def image_stats(media: DataFrame) -> DataFrame:
    """Per-image integer pixel statistics through the REAL stdlib PNG
    decode (_png_decode: container parse, zlib inflate, scanline
    un-filtering) inside Arrow-batched ``mapInPandas`` — the image twin of
    ``audio_frame_features``: channel byte-sums plus quadrant luminance
    sums (sum over the color channels of every pixel in each quadrant;
    quadrant split at ``(h+1)//2`` / ``(w+1)//2``, matching
    ``decode_real``). All outputs are exact integers so a SQL oracle can
    recompute them from a closed-form fixture with zero float drift —
    this value-checks the decode itself, not just downstream math (q143;
    q97 established the discipline for WAV).

    Non-image rows, NULL payloads, and undecodable bytes contribute zero
    rows (quarantine belongs upstream). Map-only: no shuffle, inherits
    input partitioning; one decoded image is held at a time per worker.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                f.name: [] for f in IMAGE_STATS_SCHEMA.fields
            }
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "image" or payload is None:
                    continue
                try:
                    w, h, ch, pix = _png_decode(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                csum = [0, 0, 0]
                for c in range(min(ch, 3)):
                    csum[c] = sum(pix[i] for i in range(c, len(pix), ch))
                lum_ch = 1 if ch == 2 else min(ch, 3)
                quads = [0, 0, 0, 0]
                for y in range(h):
                    row = y * w * ch
                    for x in range(w):
                        q = (2 if y >= (h + 1) // 2 else 0) + (
                            1 if x >= (w + 1) // 2 else 0
                        )
                        px = row + x * ch
                        quads[q] += sum(pix[px : px + lum_ch])
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                for c in range(3):
                    out[f"sum_c{c}"].append(csum[c])
                for q in range(4):
                    out[f"lum_q{q}"].append(quads[q])
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, IMAGE_STATS_SCHEMA
    )


def _png_encode(w: int, h: int, ch: int, pix: bytes) -> bytes:
    """Minimal stdlib PNG writer for the fixture: 8-bit RGB/gray, one IDAT,
    per-row filter type ``y % 5`` so the fixture exercises EVERY
    un-filter path (None/Sub/Up/Average/Paeth) in ``_png_decode`` —
    filters are invertible re-encodings, so the decoded pixels stay the
    closed form regardless of filter choice."""
    import struct
    import zlib

    ctype = {1: 0, 3: 2}[ch]
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pix[y * stride : (y + 1) * stride]
        ft = y % 5
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:  # Sub
            raw += bytes(
                (line[i] - (line[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:  # Up
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:  # Average
            raw += bytes(
                (
                    line[i]
                    - (((line[i - ch] if i >= ch else 0) + prev[i]) >> 1)
                )
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            enc = bytearray()
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((line[i] - pr) & 0xFF)
            raw += enc
        prev = line

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def synthetic_png_media(spark, n: int = 48) -> DataFrame:
    """Deterministic REAL-PNG fixture: every payload is a valid PNG (CRCs
    and all) whose RGB pixels follow the closed form

        v(id, x, y, c) = (id·37 + x·11 + y·23 + c·71) mod 256,
        w(id) = 6 + id mod 5,  h(id) = 4 + id mod 4

    encoded with per-row filter type ``y % 5`` (all five PNG filters
    exercised, then inverted by the decoder). A SQL oracle recomputes
    per-image channel/quadrant sums from pure integer arithmetic while
    Spark goes through the FULL byte path (parquet binary → Arrow →
    _png_decode). The image-leg mirror of ``synthetic_wav_media`` (q97)."""
    rows = []
    for i in range(n):
        w, h = 6 + i % 5, 4 + i % 4
        pix = bytes(
            (i * 37 + x * 11 + y * 23 + c * 71) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        rows.append(
            (i, "image", _png_encode(w, h, 3, pix), w, h, None, "png")
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("start_sample", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def audio_frame_features(media: DataFrame, frame_samples: int = 256) -> DataFrame:
    """Per-frame acoustic features over PCM16 WAV payloads — the audio
    analogue of video frame sampling, and the front half of every speech
    pipeline (VAD gating, silence trimming, energy-based segmentation
    before ASR): each audio row EXPLODES into one row per
    ``frame_samples``-sample mono frame carrying RMS energy, peak
    amplitude (both /2^15), and the zero-crossing count (the classic
    cheap voiced/unvoiced discriminator).

    Decode runs through the REAL stdlib WAV kernel (_wav_decode) inside
    Arrow-batched ``mapInPandas`` — the sanctioned Python path: columnar
    batches in, a frame-rows DataFrame out, fan-out bounded by
    duration/frame. Multi-channel audio downmixes to mono by per-sample
    channel mean BEFORE framing (deterministic integer→float order, so
    the exact-value tests can reproduce every float bit). Non-audio rows,
    NULL payloads, and undecodable bytes contribute zero rows — the
    quarantine discipline belongs upstream (sources/jsonl bad-record
    channel), not inside a feature kernel.

    At scale this is a map-only stage: no shuffle, output partitioning
    inherits the input, and `frame_samples` controls the fan-out (at
    16 kHz, 256 samples = 16 ms frames — the standard hop ballpark).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_FRAME_SCHEMA.fields}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "audio" or payload is None:
                    continue
                try:
                    n_ch, _rate, samples = _wav_decode(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                if n_ch > 1:
                    usable = len(samples) // n_ch * n_ch
                    samples = [
                        sum(samples[i : i + n_ch]) / n_ch
                        for i in range(0, usable, n_ch)
                    ]
                for fi in range(0, max(len(samples), 1), frame_samples):
                    frame = samples[fi : fi + frame_samples]
                    if not frame:
                        break
                    rms = (sum(v * v for v in frame) / len(frame)) ** 0.5
                    peak = max(abs(v) for v in frame)
                    zc = sum(
                        1
                        for a, b in zip(frame, frame[1:])
                        if (a < 0) != (b < 0)
                    )
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi // frame_samples)
                    out["start_sample"].append(fi)
                    out["n_samples"].append(len(frame))
                    out["rms"].append(rms / 32768.0)
                    out["peak"].append(peak / 32768.0)
                    out["zero_crossings"].append(zc)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        gen, AUDIO_FRAME_SCHEMA
    )


def synthetic_wav_media(
    spark, n: int = 48, base_samples: int = 200
) -> DataFrame:
    """Deterministic REAL-WAV fixture: every payload is a valid RIFF/PCM16
    file whose samples follow the closed form

        sample(id, j) = ((id·37 + j·11) mod 2048) − 1024,
        length(id)    = base_samples + id mod 7   (exercises partial frames)

    so a SQL oracle can recompute per-frame acoustic features from pure
    integer arithmetic while the Spark side goes through the FULL byte
    path (WAV container → _wav_decode → audio_frame_features). This is
    the q93 fixture discipline upgraded from the stub kernel to the real
    decoder: the parquet-binary → Arrow → Python decode leg itself
    becomes value-checked cross-engine (q97).
    """
    import struct

    rows = []
    for i in range(n):
        samples = [
            ((i * 37 + j * 11) % 2048) - 1024
            for j in range(base_samples + i % 7)
        ]
        pcm = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(pcm))
            + pcm
        )
        wav = b"RIFF" + struct.pack("<I", len(body)) + body
        rows.append(
            (i, "audio", wav, None, None, len(samples) * 1000 // 8000, "pcm")
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
