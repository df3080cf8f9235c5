"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step itself is STUBBED (no image/audio libs in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder derives
pixel statistics from the bytes (so the full Spark plumbing — schema,
partitioning, UDF signatures, Arrow batch shapes — is real and
tested end-to-end).

Scale notes: media blobs are large → keep them OUT of shuffles. The
pattern below extracts small typed features early (mapInPandas over the
scan, no shuffle), then drops the binary column before any wide
operation. Frame sampling emits multiple rows per input via the
mapInPandas iterator contract (batch in ≠ batch out).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta_width", T.IntegerType()),
        T.StructField("meta_height", T.IntegerType()),
        T.StructField("meta_duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_byte_milli", T.LongType()),
        T.StructField("feature_vec", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload → HxWx3 uint8 array.

    Real decode needs an image library not present in this container —
    STUB: raises unless ``fake=True``, which derives a deterministic
    8x8x3 pseudo-image from the payload bytes (stable across runs and
    partitionings, good enough to exercise every downstream shape).
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library not available here; "
            "pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer((digest * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction; binary column dropped on output."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                img = decode_image(payload, fake=fake_decode)
                flat = img.astype(np.float32)
                rows.append(
                    (
                        r.media_id,
                        hashlib.sha256(payload).hexdigest(),
                        len(payload),
                        int(np.floor(float(img.mean()) * 1000 + 0.5)),
                        (flat.mean(axis=(0, 1)) / 255.0).tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
            )

    return media.mapInPandas(gen, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, fake_decode: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1→N fan-out).

    Frames are derived deterministically from (payload, frame_idx); a
    real implementation would seek the container format here.
    """

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                n_frames = max(int(r.meta_duration_ms or 0) // every_ms, 1)
                payload = bytes(r.payload)
                for i in range(n_frames):
                    frame_sha = hashlib.sha256(payload + i.to_bytes(4, "little")).hexdigest()
                    rows.append((r.media_id, i, frame_sha))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAMES_SCHEMA.fields])

    return media.mapInPandas(gen, schema=FRAMES_SCHEMA)


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA (tests)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                8 if kind != "audio" else None,
                8 if kind != "audio" else None,
                (i % 7 + 1) * 1000 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
