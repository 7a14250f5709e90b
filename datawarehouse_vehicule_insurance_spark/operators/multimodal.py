"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``
stages.

Decode support is tiered by what this environment can do honestly:

- **real codecs** (pure stdlib + numpy, public formats): PNG
  (zlib-inflate + scanline unfiltering per the PNG spec) and PCM WAV
  (RIFF parse via ``wave``). ``fake=False`` decodes these for real.
- **stubbed**: JPEG/MP4/etc. need codec libraries absent here —
  ``NotImplementedError`` for those payloads, and ``fake=True`` gives a
  deterministic pseudo-decode so the distributed plumbing is exercisable
  with any payload.

At 100 TB the design rules are: (a) keep binary payloads OUT of shuffle —
all decode/feature stages are narrow (mapInPandas over the scan
partitioning); (b) size partitions by bytes not rows
(``spark.sql.files.maxPartitionBytes``) since payloads dominate; (c) emit
compact features and drop the payload column as early as possible.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(data: bytes) -> tuple[int, int, float]:
    """Minimal real PNG decoder (stdlib zlib + numpy): 8-bit depth,
    grayscale/RGB(A), non-interlaced — returns (width, height,
    mean_luma in [0,1]). Implements the five scanline filters from the
    PNG specification (None/Sub/Up/Average/Paeth); luma is ITU-R BT.601
    (0.299 R + 0.587 G + 0.114 B)."""
    import numpy as np

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            w, h, bitd, colort, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            meta = (w, h, bitd, colort, interlace)
        elif ctype == b"IDAT":
            idat.append(chunk)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, bitd, colort, interlace = meta
    if bitd != 8 or interlace != 0 or colort not in (0, 2, 4, 6):
        raise NotImplementedError(
            f"PNG subset: 8-bit non-interlaced gray/RGB(A) only "
            f"(bit depth {bitd}, color type {colort}, interlace {interlace})"
        )
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[colort]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        cur = np.frombuffer(
            raw[pos + 1:pos + 1 + stride], dtype=np.uint8
        ).astype(np.int32)
        pos += 1 + stride
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — vectorized
            cur = (cur + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x
            cur = cur.copy()
            for x in range(channels, stride):
                cur[x] = (cur[x] + cur[x - channels]) & 0xFF
        elif ftype == 3:  # Average
            cur = cur.copy()
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = cur.copy()
            for x in range(stride):
                a = int(cur[x - channels]) if x >= channels else 0
                b = int(prev[x])
                c = int(prev[x - channels]) if x >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, channels).astype(np.float64)
    if colort in (0, 4):  # gray / gray+alpha
        luma = px[:, :, 0]
    else:  # RGB / RGBA
        luma = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return w, h, float(luma.mean() / 255.0)


def decode_bmp(data: bytes) -> tuple[int, int, float]:
    """Minimal real BMP decoder (pure struct + numpy): uncompressed
    (BI_RGB) 24/32-bit BITMAPINFOHEADER files — the common case for the
    format. Rows are bottom-up and 4-byte padded per the spec; luma is
    the same BT.601 combination as :func:`decode_png`."""
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP: BITMAPCOREHEADER not supported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP subset: uncompressed 24/32bpp only (bpp={bpp}, "
            f"compression={compression})"
        )
    h = abs(h_raw)
    nch = bpp // 8
    stride = ((w * nch) + 3) & ~3
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:  # bottom-up storage
        rows = rows[::-1]
    px = rows.astype(np.float64)
    # BMP channel order is BGR(A)
    luma = 0.299 * px[:, :, 2] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 0]
    return w, h, float(luma.mean() / 255.0)


def decode_wav(data: bytes) -> tuple[int, float]:
    """Real PCM WAV decoder (stdlib ``wave`` + numpy): returns
    (duration_ms, rms_level in [0,1] relative to full scale)."""
    import io
    import wave as _wave

    import numpy as np

    with _wave.open(io.BytesIO(data), "rb") as wf:
        n, rate, width = wf.getnframes(), wf.getframerate(), wf.getsampwidth()
        frames = wf.readframes(n)
    duration_ms = int(round(n * 1000 / rate))
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        full = 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        full = 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64)
        full = 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {width} not supported")
    rms = float(np.sqrt(np.mean((x / full) ** 2))) if len(x) else 0.0
    return duration_ms, rms

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
    """Real decode for PNG (:func:`decode_png`) and BMP
    (:func:`decode_bmp`) payloads; other formats (JPEG/WebP/...) need
    codec libraries absent in this environment and raise
    ``NotImplementedError``. ``fake=True`` derives deterministic
    pseudo-features from the raw bytes for any payload so the
    distributed plumbing is testable format-independently."""
    if fake:
        n = len(payload)
        width = (n % 640) + 1
        height = (n % 480) + 1
        mean_luma = (sum(payload[:64]) / max(min(n, 64), 1)) / 255.0
        return width, height, mean_luma
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "real decode supports PNG and BMP only in this environment; "
        "other formats need an image codec library "
        "(run with fake=True for the deterministic stub)"
    )


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
    feature-extract via mapInPandas. Real decode for RIFF/WAVE PCM
    payloads (:func:`decode_wav` — duration from the frame count, RMS
    from the samples); other formats raise ``NotImplementedError``;
    ``fake=True`` derives a deterministic RMS-like level from the raw
    bytes for any payload."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None:
                    rows.append((asset_id, None, None, None))
                    continue
                data = bytes(payload)
                n = len(data)
                if fake:
                    rms = (sum(b * b for b in data[:256])
                           / max(min(n, 256), 1)) ** 0.5 / 255.0
                    rows.append((asset_id, n, dur, rms))
                    continue
                if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
                    real_dur, rms = decode_wav(data)
                    rows.append((asset_id, n, real_dur, rms))
                    continue
                raise NotImplementedError(
                    "real decode supports PCM WAV only in this "
                    "environment; other formats need an audio codec "
                    "library (run with fake=True for the stub)"
                )
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
