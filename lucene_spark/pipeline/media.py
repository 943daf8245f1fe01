"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition-friendly mapInPandas kernels, deterministic feature extraction.

Codecs (r4): uncompressed 24-bit BMP and RIFF/WAVE PCM-16 are decoded
and encoded FOR REAL with pure struct/numpy (no external libraries) —
`decode_bmp`/`encode_bmp`, `decode_wav`/`encode_wav_pcm16`, a real
nearest-neighbor `resize_image` for BMP, and `media_decode_features`
measuring width/height/luma/duration/RMS from the decoded arrays
(oracle-dueled via closed-form synthetic assets, gate `media_decode`).
Formats that genuinely require libjpeg/ffmpeg (JPEG, PNG, MP4 frame
sampling) remain behind the documented one-function stub:
`decode_image` raises NotImplementedError for them unless `fake=True`
(deterministic content-derived pseudo-decode). Swapping that stub for
PIL/ffmpeg changes ONE function; the distributed plumbing (binary
column in, fixed-shape feature column out, batch-at-a-time Arrow
transfer) is exactly what production would run.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("mime", StringType()),
        StructField("width", IntegerType()),    # -1 when N/A
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),   # opaque encoded bytes
    ]
)

FEATURE_DIM = 16


def synth_media_df(spark: SparkSession, docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic binary media table derived from the documents table
    (payload = utf-8 text bytes posing as an encoded image)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("image/x-fake").alias("mime"),
        (F.length("text") % 640).cast("int").alias("width"),
        (F.length("text") % 480).cast("int").alias("height"),
        F.lit(-1).cast("int").alias("duration_ms"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
    )


def decode_image(payload: bytes, *, fake: bool = False) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    REAL for uncompressed 24-bit BMP payloads (pure-numpy codec below,
    r4); other formats (JPEG/PNG) need an image library not present in
    this container — with fake=True those return a deterministic 8x8x3
    pseudo-image derived from the payload's md5 stream (stable across
    machines)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not fake:
        raise NotImplementedError(
            "non-BMP image decoding requires PIL/libjpeg — not available "
            "in this environment; pass fake=True for the deterministic "
            "test stub"
        )
    h = hashlib.md5(payload).digest()
    stream = bytearray()
    block = h
    while len(stream) < 8 * 8 * 3:
        block = hashlib.md5(block).digest()
        stream.extend(block)
    return np.frombuffer(bytes(stream[: 8 * 8 * 3]), dtype=np.uint8).reshape(8, 8, 3)


def media_features(
    spark: SparkSession, media: DataFrame, *, fake_decode: bool = True
) -> DataFrame:
    """(media_id, feature: array<float>[FEATURE_DIM], mean_luma) — the
    decode -> feature-extract stage as a batched Arrow kernel. The
    feature here is the first FEATURE_DIM bytes of md5(payload) scaled to
    [0,1) (deterministic, SQL-reproducible for the oracle duel); mean_luma
    comes from the (stub-)decoded pixels."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("feature", ArrayType(FloatType())),
            StructField("mean_luma", FloatType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids, feats, lumas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                digest = hashlib.md5(raw).digest()
                feat = (
                    np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8)
                    .astype(np.float32) / np.float32(256.0)
                )
                img = decode_image(raw, fake=fake_decode)
                # Rec.601 luma over the pseudo-pixels
                luma = float(
                    (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114)
                    .mean()
                )
                ids.append(int(mid))
                feats.append(feat.tolist())
                lumas.append(np.float32(luma))
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "mean_luma": lumas}
            )

    return media.select("media_id", "payload").mapInPandas(fn, schema=schema)


# --------------------------------------------------------------------------
# REAL codecs (no external libraries needed): uncompressed 24-bit BMP
# and RIFF/WAVE PCM-16 are fully specified byte layouts that pure
# struct/numpy can read and write. These replace the r1-r3 "everything
# is stubbed" seam for the formats that don't require libjpeg/ffmpeg;
# JPEG/PNG/MP4 remain behind the documented one-function stub below.
# --------------------------------------------------------------------------

import struct


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB -> uncompressed 24-bit BI_RGB .bmp bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR order,
    4-byte row padding — the classic Windows 3.x layout)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    bgr = arr[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB .bmp bytes -> HxWx3 uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP supported")
    row_bytes = (w * 3 + 3) & ~3
    flip = h > 0
    h = abs(h)
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples -> RIFF/WAVE PCM-16 bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(pcm)) + pcm
    return struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE") + fmt + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 mono bytes -> (sample_rate, int16 samples).
    Walks the chunk list (fmt may be followed by LIST/fact chunks)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only mono PCM-16 supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), samples


def synth_real_media_df(
    spark: SparkSession, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic REAL media table: per doc, one genuine BMP image
    (solid color (37i%256, 59i%256, 83i%256), size (8+i%16) x (8+i%8))
    and one genuine WAV clip (±amp square wave, amp = 1000+500*(i%7),
    8 kHz, 160+80*(i%5) samples). Every derived property has a closed
    form in doc_id, so a SQL oracle can verify the REAL decode path
    end-to-end without being able to parse the bytes itself."""

    def fn(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "kind", "mime", "width", "height",
                "duration_ms", "payload",
            )}
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 16, 8 + i % 8
                color = np.array(
                    [37 * i % 256, 59 * i % 256, 83 * i % 256], np.uint8
                )
                img = np.broadcast_to(color, (h, w, 3)).copy()
                rows["media_id"].append(2 * i)
                rows["kind"].append("image")
                rows["mime"].append("image/bmp")
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(-1)
                rows["payload"].append(encode_bmp(img))

                amp = 1000 + 500 * (i % 7)
                n = 160 + 80 * (i % 5)
                sq = np.full(n, amp, dtype=np.int16)
                sq[1::2] = -amp
                rows["media_id"].append(2 * i + 1)
                rows["kind"].append("audio")
                rows["mime"].append("audio/wav")
                rows["width"].append(-1)
                rows["height"].append(-1)
                rows["duration_ms"].append(n * 1000 // 8000)
                rows["payload"].append(encode_wav_pcm16(sq, 8000))
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


def media_decode_features(spark: SparkSession, media: DataFrame) -> DataFrame:
    """REAL decode -> per-asset properties, as one Arrow kernel:
    images (BMP) -> measured width/height + Rec.601 mean luma;
    audio (WAV PCM-16) -> sample_rate, measured duration_ms, RMS.
    N/A fields are -1 / NULL. All measurements come from the DECODED
    arrays, never the metadata columns — that's what makes the oracle
    duel an end-to-end codec test."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("duration_ms", IntegerType()),
            # doubles, not float32: these get ROUND()ed in the oracle
            # duel and the repo rule is "never round float32"
            StructField("mean_luma", DoubleType()),
            StructField("rms", DoubleType()),
        ]
    )

    def fn(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "width", "height", "duration_ms",
                "mean_luma", "rms",
            )}
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload)
                out["media_id"].append(int(mid))
                out["kind"].append(str(kind))
                if raw[:2] == b"BM":
                    img = decode_bmp(raw).astype(np.float64)
                    luma = (
                        img[..., 0] * 0.299
                        + img[..., 1] * 0.587
                        + img[..., 2] * 0.114
                    ).mean()
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["duration_ms"].append(-1)
                    out["mean_luma"].append(float(luma))
                    out["rms"].append(None)
                elif raw[:4] == b"RIFF":
                    rate, samples = decode_wav(raw)
                    rms = float(
                        np.sqrt(np.mean(samples.astype(np.float64) ** 2))
                    )
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["duration_ms"].append(len(samples) * 1000 // rate)
                    out["mean_luma"].append(None)
                    out["rms"].append(float(rms))
                else:
                    out["width"].append(-1)
                    out["height"].append(-1)
                    out["duration_ms"].append(-1)
                    out["mean_luma"].append(None)
                    out["rms"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        fn, schema=schema
    )


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Re-encode at a new size. REAL for uncompressed BMP payloads
    (numpy nearest-neighbor resample); JPEG/PNG still need PIL."""
    if payload[:2] == b"BM":
        img = decode_bmp(payload)
        h, w = img.shape[:2]
        yi = np.minimum((np.arange(height) * h) // height, h - 1)
        xi = np.minimum((np.arange(width) * w) // width, w - 1)
        return encode_bmp(img[yi][:, xi])
    raise NotImplementedError(
        "non-BMP image resize requires PIL — not available in this environment"
    )


def sample_video_frames(payload: bytes, every_ms: int) -> list[bytes]:
    """STUB: frame sampling. Requires ffmpeg bindings."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg — not available in this environment"
    )
