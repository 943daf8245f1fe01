"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partition-friendly mapInPandas kernels, deterministic feature extraction —
while the actual codec work (JPEG decode, audio resample, video frame
sampling) is stubbed: the sandbox ships no image/audio libraries, so
`decode_image` raises NotImplementedError unless `fake=True`, which
substitutes a deterministic content-derived pseudo-decode. Swapping the
stub for PIL/ffmpeg changes ONE function; the distributed plumbing
(binary column in, fixed-shape feature column out, batch-at-a-time Arrow
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

    STUB: real decoding needs an image library not present in this
    container. With fake=True returns a deterministic 8x8x3 pseudo-image
    derived from the payload's md5 stream (stable across machines)."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libjpeg — not available in this "
            "environment; pass fake=True for the deterministic test stub"
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


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB: re-encode at a new size. Requires an image library."""
    raise NotImplementedError(
        "image resize requires PIL — not available in this environment"
    )


def sample_video_frames(payload: bytes, every_ms: int) -> list[bytes]:
    """STUB: frame sampling. Requires ffmpeg bindings."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg — not available in this environment"
    )
