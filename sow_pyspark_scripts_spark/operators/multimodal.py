"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The pattern a 100 TB training-data pipeline needs: media (image/audio/
video) as ``binary`` columns with a typed metadata struct alongside, and
decode / feature-extract / resize / frame-sample as ``mapInPandas``
stages — Arrow batches of bytes into a Python worker, columnar results
out. The decode libraries (PIL/ffmpeg/librosa) are NOT in this
container, so the real decoders are stubbed behind NotImplementedError;
``fake_decode_meta`` is the deterministic stand-in that keeps the whole
pipeline — schema, batching, partitioning, UDF signature — real and
testable (and, because it derives from md5, oracle-checkable).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# payload + typed metadata: the multimodal column contract.
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def media_table(docs: DataFrame) -> DataFrame:
    """Wrap documents as a media table: utf-8 payload bytes + metadata.
    (With real data this is the parquet/lance binary column as stored.)"""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes"),
    )


def pil_available() -> bool:
    """True when PIL can be imported here (and thus on local executors)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """Real image decode: (width, height, n_frames) via PIL when the
    optional dependency is installed; NotImplementedError otherwise (the
    honest stub — this container ships no image libs). The mapInPandas
    plumbing in ``decode_media`` is identical either way."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "image decoding requires PIL/ffmpeg, not available in this "
            "environment; use fake_decode=True for the deterministic test double"
        ) from None
    img = Image.open(BytesIO(payload))
    return img.width, img.height, getattr(img, "n_frames", 1)


def decode_media(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas decode stage: binary payload batches in, typed metadata
    out. Arrow moves the bytes; the Python worker never sees row-at-a-time
    overhead. Partitioning is preserved (narrow transform), so a
    repartition upstream sizes decode batches independently of file layout.

    ``fake_decode=True`` (the oracle path) derives metadata from the
    payload md5 — deterministic and SQL-replayable. ``fake_decode=False``
    runs the REAL decoder (``decode_image``) inside the same Arrow stage;
    it is gated on PIL at build time so a missing dependency fails fast
    on the driver, never as a mid-job executor crash.
    """
    if not fake_decode:
        if not pil_available():
            # surface the missing dependency as NotImplementedError at
            # build time, not a silent fake
            decode_image(b"")

        def _decode_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                dims = pdf["payload"].map(lambda b: decode_image(bytes(b)))
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "n_bytes": pdf["payload"].map(len).astype("int64"),
                        "width": dims.map(lambda d: d[0]).astype("int64"),
                        "height": dims.map(lambda d: d[1]).astype("int64"),
                        "n_frames": dims.map(lambda d: d[2]).astype("int64"),
                    }
                )

        return media.mapInPandas(_decode_real, DECODED_SCHEMA)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            h = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    # deterministic fake "decode": dimensions from the
                    # payload digest (mirrors the md5-based SQL oracle)
                    "width": h.map(lambda x: 16 + int(x[0], 16)).astype("int64"),
                    "height": h.map(lambda x: 16 + int(x[1], 16)).astype("int64"),
                    "n_frames": h.map(lambda x: 1 + int(x[2], 16) % 8).astype("int64"),
                }
            )

    return media.mapInPandas(_decode, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("new_width", LongType()),
        StructField("new_height", LongType()),
    ]
)


def resize_media(decoded: DataFrame, max_dim: int = 24) -> DataFrame:
    """mapInPandas resize stage: scale dims so max(w,h) <= max_dim,
    aspect ratio preserved, never upscale. With a real codec the worker
    resizes pixel buffers; the geometry arithmetic (the testable part) is
    identical and stays deterministic."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = (max_dim / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "new_width": (pdf["width"] * scale).map(int).astype("int64"),
                    "new_height": (pdf["height"] * scale).map(int).astype("int64"),
                }
            )

    return decoded.select("doc_id", "width", "height").mapInPandas(
        _resize, RESIZED_SCHEMA
    )


def sample_frames(decoded: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling: one row per kept frame index (0, stride, ...).

    Index generation is pure arithmetic, so it stays JVM-side
    (sequence + explode — Spark-first beats a UDF here); only the
    per-frame pixel extraction would call into a decode UDF downstream.
    """
    return decoded.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
    ]
)


def probe_audio(media: DataFrame) -> DataFrame:
    """mapInPandas audio probe stage: payload bytes in, (sample_rate,
    n_samples) out — the ffprobe/soundfile header read of an ASR ingest
    pipeline. The real probe is stubbed (no audio libs in this
    container); the deterministic fake derives both fields from the
    payload digest, mirrored exactly by the md5-based SQL oracle, so the
    Arrow plumbing and schema are tested for real."""

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            h = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # 8/16/24 kHz from nibble 4
                    "sample_rate": h.map(
                        lambda x: 8000 * (1 + int(x[3], 16) % 3)
                    ).astype("int64"),
                    # 30-330s of audio from nibbles 5-6
                    "n_samples": [
                        int(sr * (30 + 20 * (int(x[4], 16) + int(x[5], 16))))
                        for x, sr in zip(
                            h, h.map(lambda x: 8000 * (1 + int(x[3], 16) % 3))
                        )
                    ],
                }
            )

    return media.mapInPandas(_probe, AUDIO_SCHEMA)
