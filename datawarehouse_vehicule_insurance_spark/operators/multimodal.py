"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

The Spark-side architecture is real and tested — schemas, batch iteration,
partition sizing; the codec work itself is stubbed (the image/audio
libraries are not in this environment): :func:`decode_image` raises
``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake decode so the pipeline shape can be exercised
end-to-end.

At 100 TB the design rules are: (a) keep binary payloads OUT of shuffle —
all decode/feature stages are narrow (mapInPandas over the scan
partitioning); (b) size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``) since payloads dominate; (c) emit
compact features and drop the payload column as early as possible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: A multimodal asset table schema: payload + typed metadata.
ASSET_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("modality", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime_type", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("mean_luma", T.DoubleType(), True),
])


def _decode_image_bytes(payload: bytes, fake: bool) -> tuple[int, int, float]:
    """STUB — real decode needs an image codec library not present in
    this environment. ``fake=True`` derives deterministic pseudo-features
    from the raw bytes so the distributed plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an image codec library; "
            "run with fake=True for the deterministic stub"
        )
    n = len(payload)
    width = (n % 640) + 1
    height = (n % 480) + 1
    mean_luma = (sum(payload[:64]) / max(min(n, 64), 1)) / 255.0
    return width, height, mean_luma


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract image assets via Arrow-batched
    mapInPandas. Narrow (no shuffle); the payload column never leaves the
    stage — output is compact features only."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    feats.append((asset_id, None, None, None, None))
                    continue
                w, h, luma = _decode_image_bytes(bytes(payload), fake)
                feats.append((asset_id, len(payload), w, h, luma))
            yield pd.DataFrame(
                feats,
                columns=["asset_id", "n_bytes", "width", "height",
                         "mean_luma"],
            )

    return df.filter(df.modality == "image").select(
        "asset_id", "payload"
    ).mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("n_bytes", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("rms_level", T.DoubleType(), True),
])


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio analogue of :func:`extract_image_features`: decode +
    feature-extract via mapInPandas. STUB decode — ``fake=True`` derives
    a deterministic RMS-like level from the raw bytes; a real build
    swaps an audio codec in behind the same signature."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None:
                    rows.append((asset_id, None, None, None))
                    continue
                if not fake:
                    raise NotImplementedError(
                        "audio decode requires a codec library; "
                        "run with fake=True for the deterministic stub"
                    )
                data = bytes(payload)
                n = len(data)
                rms = (sum(b * b for b in data[:256]) / max(min(n, 256), 1)) ** 0.5 / 255.0
                rows.append((asset_id, n, dur, rms))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_bytes", "duration_ms", "rms_level"],
            )

    return df.filter(df.modality == "audio").select(
        "asset_id", "payload", "duration_ms"
    ).mapInPandas(_extract, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_hash", T.LongType(), True),
])


def sample_video_frames(
    df: DataFrame, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing for video assets: one output row per
    sampled frame. STUB decode — ``fake=True`` hashes byte slices as
    stand-in frames; a real build swaps in a video codec behind the same
    mapInPandas signature."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video decode requires a codec library; "
                        "run with fake=True for the deterministic stub"
                    )
                data = bytes(payload)
                n_frames = max(len(data) // 256, 1)
                for idx in range(0, n_frames, every_n):
                    chunk = data[idx * 256:(idx + 1) * 256]
                    # stable across processes/runs — builtin hash() is
                    # PYTHONHASHSEED-salted and would differ per executor
                    digest = hashlib.blake2b(chunk, digest_size=8).digest()
                    frame_hash = (
                        int.from_bytes(digest, "big") & 0x7FFFFFFFFFFFFFFF
                    )
                    rows.append((asset_id, idx, frame_hash))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_hash"]
            )

    return df.filter(df.modality == "video").select(
        "asset_id", "payload"
    ).mapInPandas(_sample, FRAME_SAMPLE_SCHEMA)
