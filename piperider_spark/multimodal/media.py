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


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches payload bytes (columnar
    pruning: the parquet scan reads only meta.*)."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("meta.width").alias("avg_width"),
        F.avg("meta.height").alias("avg_height"),
        F.sum(F.length("media").cast("long")).alias("total_bytes"),
    )
