"""Multimodal column handling: opaque binary payloads + typed metadata.

The input_hint documents interleave media spans (kind='media', media_ref)
with text. At 100 TB the media bytes live in object storage; the engine's job
is the Spark-side plumbing — schema, partition sizing, Arrow batch shape —
with per-modality transforms as ``mapInPandas`` stages.

The image/audio decode libraries are not in this container, so the decode
kernels are STUBS behind ``_HAS_PIL``-style gates: they raise
NotImplementedError when a real decode is requested, or produce a
deterministic fake (seeded from the payload digest) when ``fake=True`` so the
batch plumbing is fully testable. The Spark-side contract — input/output
schemas, batch iteration, column pruning — is real and tested either way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # decode libs are absent in this sandbox; gate, never hard-import
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
    ]
)

_FEATURE_DIM = 8


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decode→embed kernel: 8 floats
    derived from the md5 digest. Replaces (not approximates) the decode step
    this container cannot run."""
    d = hashlib.md5(payload or b"").digest()
    return [v / 255.0 for v in struct.unpack("8B", d[:8])]


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary media payloads.

    Arrow-batched; each batch arrives as a pandas frame of (media_ref,
    modality, payload, meta_*). With ``fake=False`` and no decode library the
    stage raises NotImplementedError — the documented stub boundary."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake and not _HAS_PIL:
                raise NotImplementedError(
                    "real media decode requires PIL/libav; not in this container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "modality": pdf["modality"],
                    "feature": payloads.map(
                        lambda b: _fake_feature(bytes(b) if b is not None else b"")
                    ),
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(bytes(b) if b is not None else b"").hexdigest()
                    ),
                }
            )

    return media.select(
        "media_ref", "modality", "payload"
    ).mapInPandas(batches, FEATURES_SCHEMA)


def resize_plan(media: DataFrame, target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Image resize stage: Spark-side plan is real (filter to images, size
    metadata arithmetic, pass-through payloads); the pixel kernel is the same
    stub boundary as extract_media_features."""
    w, h = target
    imgs = media.filter(F.col("modality") == "image")
    return imgs.select(
        "media_ref",
        F.lit(w).alias("target_width"),
        F.lit(h).alias("target_height"),
        (F.col("meta_width") * F.col("meta_height")).alias("src_pixels"),
        F.when(
            (F.col("meta_width") > w) | (F.col("meta_height") > h), "downscale"
        ).otherwise("upscale").alias("direction"),
        "payload",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling stage: emits one row per planned frame timestamp
    via sequence+explode (pure JVM); frame extraction itself is the stub."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-bytes)."""
    rows = []
    for i in range(n):
        mod = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (1 + i % 5)
        rows.append(
            (
                f"m://{i:06d}",
                mod,
                bytearray(payload),
                64 + i % 512 if mod == "image" else None,
                48 + i % 256 if mod == "image" else None,
                (i % 30 + 1) * 1000 if mod == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)
