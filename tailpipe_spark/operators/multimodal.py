"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched processing plumbing.

The decode kernels (image decode, resample, frame extraction) need
codec libraries that aren't in this container, so the *kernels* are
stubbed deterministically — but everything Spark-side is real and
tested: schemas, batch iteration via ``mapInPandas`` (Arrow transfer,
no per-row Python), partition sizing, and the metadata contract. On a
real cluster you replace one function body with PIL/ffmpeg calls and
the plan is unchanged.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset row (binary payload + typed metadata)
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """Deterministic fake feature extractor.

    REAL IMPLEMENTATION REQUIRES CODEC LIBS (PIL / torchaudio / ffmpeg)
    — not available in this container. The stub derives an 8-dim
    feature from payload bytes so the pipeline is end-to-end testable
    and reproducible; swap this body for the real kernel in production.
    """
    if payload is None:
        raise NotImplementedError("real decode needs codec libraries")
    acc = [0] * 8
    for i, b in enumerate(payload):
        acc[i % 8] = (acc[i % 8] + b) % 997
    return [float(x) / 997.0 for x in acc]


def extract_features(assets: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Binary payloads → feature vectors via Arrow-batched mapInPandas.

    The UDF sees whole Arrow batches (no per-row overhead); payloads
    never pass through the driver. Repartition upstream so a batch of
    payloads fits executor memory (binary columns dominate size).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "payload_bytes": [
                        len(p) if p is not None else None for p in pdf["payload"]
                    ],
                    "checksum": [
                        hashlib.md5(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": [
                        _decode_stub(p, m) if p is not None else None
                        for p, m in zip(pdf["payload"], pdf["modality"])
                    ],
                }
            )
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to images, updates metadata, and
    passes payloads through the (stubbed) kernel batch-wise."""

    out_schema = T.StructType(
        list(ASSET_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # REAL kernel would decode+resize; stub keeps payload, fixes meta
            pdf = pdf.copy()
            pdf["meta"] = [
                {"width": width, "height": height, "duration_ms": None, "sample_rate": None}
                for _ in range(len(pdf))
            ]
            yield pdf

    return (
        assets.filter(F.col("modality") == "image")
        .mapInPandas(run, schema=out_schema)
    )


def resample_audio(assets: DataFrame, sample_rate: int) -> DataFrame:
    """Audio resample plumbing: filters to audio, rewrites sample_rate
    metadata, passes payloads through the (stubbed) kernel batch-wise —
    same Arrow shape as :func:`resize_images`; swap the body for a
    torchaudio/ffmpeg call in production."""

    out_schema = T.StructType(list(ASSET_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["meta"] = [
                {
                    "width": None,
                    "height": None,
                    "duration_ms": (m or {}).get("duration_ms"),
                    "sample_rate": sample_rate,
                }
                for m in pdf["meta"]
            ]
            yield pdf

    return (
        assets.filter(F.col("modality") == "audio")
        .mapInPandas(run, schema=out_schema)
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame rows (one row per sampled frame). The explode is
    computed from metadata JVM-side; frame decode itself is the stub."""
    videos = assets.filter(F.col("modality") == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    frames = videos.select(
        "asset_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    )
    return frames.withColumn("frame_ts_ms", F.col("frame_no") * F.lit(every_ms))
