"""Multimodal column operators over opaque ``binary`` payloads.

Schema convention (the training-data-pipeline shape the north rule asks
for): a media table carries ``(id, media binary, media_type string,
meta struct<width:int, height:int, sample_rate:int, n_frames:int>)`` —
payload opaque, metadata typed.

The Spark-side plumbing — schema handling, partition-sized batch iteration
through ``mapInPandas``, UDF signatures, output shapes — is real and
tested. The codec layer is stubbed: ``decode_image``/``decode_audio`` raise
NotImplementedError unless the deterministic fake codec is selected
(payloads produced by :func:`fake_encode_image`), because no media library
(PIL/cv2/librosa) is available in this container. A real deployment swaps
``_CODECS['image']`` for a PIL/turbojpeg call — nothing else changes.

Design notes for 100 TB of media:
  * decode/feature-extract goes through ``mapInPandas`` (not a scalar UDF):
    one Arrow batch of payload bytes in, an iterator of result frames out —
    memory stays bounded by batch size, not partition size;
  * payloads should live in their own parquet column chunk; projecting
    metadata only (``meta.*``) never touches the bytes (columnar pruning);
  * resize/frame-sample emit binary back, so chains of media ops stay
    inside one python worker stage (Catalyst fuses adjacent mapInPandas).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
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
        StructField("id", LongType()),
        StructField("media", BinaryType()),
        StructField("media_type", StringType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

_FAKE_MAGIC = b"FIMG"


def fake_encode_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload: magic + dims + md5-seeded pixel
    bytes. Stands in for a JPEG so the full pipeline is testable."""
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(f"img:{seed}".encode()).digest()[:8], "big")
    )
    pixels = rng.integers(0, 256, size=width * height * 3, dtype=np.uint8)
    return _FAKE_MAGIC + struct.pack("<II", width, height) + pixels.tobytes()


def _decode_fake_image(payload: bytes) -> np.ndarray:
    if payload[:4] != _FAKE_MAGIC:
        raise ValueError("not a fake image payload")
    w, h = struct.unpack("<II", payload[4:12])
    return np.frombuffer(payload[12:], dtype=np.uint8).reshape(h, w, 3)


def _decode_real_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "real image decoding requires PIL/cv2 (not in this container); "
        "use codec='fake' or register a codec"
    )


_CODECS = {"fake": _decode_fake_image, "image": _decode_real_image}

_FEATURE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_image_features(df: DataFrame, codec: str = "fake", embed_dim: int = 16) -> DataFrame:
    """Decode + feature-extract via mapInPandas: per-image channel means and
    a deterministic pooled embedding (grid-average downsample)."""
    decode = _CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                img = decode(bytes(payload))
                h, w, _ = img.shape
                means = img.reshape(-1, 3).mean(axis=0)
                # grid-pool to an embed_dim vector (luma of sqrt-grid cells)
                g = int(np.sqrt(embed_dim))
                luma = img.mean(axis=2)
                cells = [
                    float(
                        luma[
                            i * h // g : (i + 1) * h // g or h,
                            j * w // g : (j + 1) * w // g or w,
                        ].mean()
                    )
                    for i in range(g)
                    for j in range(g)
                ]
                rows.append(
                    (int(mid), w, h, float(means[0]), float(means[1]), float(means[2]), cells)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FEATURE_TYPE.fields]
            )

    return df.select("id", "media").mapInPandas(run, _FEATURE_TYPE)


_RESIZE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(df: DataFrame, out_w: int, out_h: int, codec: str = "fake") -> DataFrame:
    """Nearest-neighbour resize, payload→payload (fake-codec format)."""
    decode = _CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                img = decode(bytes(payload))
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = img[np.ix_(yi, xi)]
                payload_out = (
                    _FAKE_MAGIC + struct.pack("<II", out_w, out_h) + small.tobytes()
                )
                rows.append((int(mid), payload_out, out_w, out_h))
            yield pd.DataFrame(rows, columns=[f.name for f in _RESIZE_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _RESIZE_TYPE)


_FAKE_AUDIO_MAGIC = b"FAUD"
_FAKE_VIDEO_MAGIC = b"FVID"


def fake_encode_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic fake audio payload: magic + rate + count + int16 PCM."""
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(f"aud:{seed}".encode()).digest()[:8], "big")
    )
    pcm = rng.integers(-(2**14), 2**14, size=n_samples, dtype=np.int16)
    return _FAKE_AUDIO_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def _decode_fake_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:4] != _FAKE_AUDIO_MAGIC:
        raise ValueError("not a fake audio payload")
    rate, n = struct.unpack("<II", payload[4:12])
    return rate, np.frombuffer(payload[12:], dtype=np.int16)[:n]


def _decode_real_audio(payload: bytes):  # pragma: no cover
    raise NotImplementedError(
        "real audio decoding requires librosa/soundfile (not in this "
        "container); use codec='fake' or register a codec"
    )


_AUDIO_CODECS = {"fake": _decode_fake_audio, "audio": _decode_real_audio}

_AUDIO_FEATURE_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_sec", FloatType()),
        StructField("rms", FloatType()),
        StructField("peak", FloatType()),
        StructField("zero_cross_rate", FloatType()),
    ]
)


def extract_audio_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode + per-clip audio features (duration, RMS, peak, zero-crossing
    rate) via mapInPandas — one Arrow batch of payloads in, bounded memory."""
    decode = _AUDIO_CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                rate, pcm = decode(bytes(payload))
                x = pcm.astype(np.float32) / 2**15
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                rows.append(
                    (
                        int(mid),
                        int(rate),
                        float(len(x) / rate) if rate else 0.0,
                        float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                        float(np.abs(x).max()) if len(x) else 0.0,
                        zc,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _AUDIO_FEATURE_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _AUDIO_FEATURE_TYPE)


def fake_encode_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake video payload: magic + dims + frame count + frames
    of raw RGB (each frame md5-seeded so frames differ deterministically)."""
    out = [_FAKE_VIDEO_MAGIC, struct.pack("<III", width, height, n_frames)]
    for f in range(n_frames):
        rng = np.random.default_rng(
            int.from_bytes(hashlib.md5(f"vid:{seed}:{f}".encode()).digest()[:8], "big")
        )
        out.append(
            rng.integers(0, 256, size=width * height * 3, dtype=np.uint8).tobytes()
        )
    return b"".join(out)


_FRAME_TYPE = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("media", BinaryType()),  # fake-image payload per frame
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def sample_frames(df: DataFrame, stride: int = 10, codec: str = "fake") -> DataFrame:
    """Frame-sampling: every ``stride``-th frame of each video becomes one
    output row whose payload is a standalone fake-image (so the sampled
    frames feed directly into extract_image_features / resize_images —
    adjacent mapInPandas stages stay in one python worker stage).

    Memory note: frames are sliced straight out of the payload buffer one
    at a time — the full frame list is never materialized."""
    if codec != "fake":  # pragma: no cover
        raise NotImplementedError("real video decoding requires pyav/cv2")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["id"], pdf["media"]):
                buf = bytes(payload)
                if buf[:4] != _FAKE_VIDEO_MAGIC:
                    raise ValueError("not a fake video payload")
                w, h, n = struct.unpack("<III", buf[4:16])
                fsz = w * h * 3
                for fi in range(0, n, max(stride, 1)):
                    frame = buf[16 + fi * fsz : 16 + (fi + 1) * fsz]
                    rows.append(
                        (
                            int(mid),
                            fi,
                            _FAKE_MAGIC + struct.pack("<II", w, h) + frame,
                            w,
                            h,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_TYPE.fields])

    return df.select("id", "media").mapInPandas(run, _FRAME_TYPE)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches payload bytes (columnar
    pruning: the parquet scan reads only meta.*)."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.height").alias("avg_height"),
        F.sum(F.length("media").cast("long")).alias("total_bytes"),
    )
