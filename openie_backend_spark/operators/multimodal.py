"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed with Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (md5-seeded pixels) behind
``_decode_image``; the Spark-side plumbing — schema, batch iteration,
partition sizing, UDF signatures — is real and tested. Swapping in a
real decoder (PIL / torchaudio) changes only the two marked functions.

Scale notes: binary payloads ride in their own column so column
pruning keeps metadata-only queries off the blobs;
``spark.sql.files.maxPartitionBytes`` governs blob-scan partitioning;
the UDFs stream per Arrow batch and never materialize a partition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),       # image | audio | video
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("payload_bytes", IntegerType(), False),
    ]
)


def _decode_image(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB DECODER — deterministic fake. A real build replaces this
    with PIL/open-cv decode; no image libraries ship in this container.
    Produces a dim-length float vector seeded by the payload digest so
    downstream plumbing is fully exercised and reproducible."""
    if payload is None:
        raise NotImplementedError("real image decode requires PIL; payload missing")
    digest = hashlib.md5(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    return rng.random(dim, dtype=np.float64).astype(np.float32)


def _sample_frames(payload: bytes, n_frames: int = 4) -> list[bytes]:
    """STUB FRAME SAMPLER — deterministic fake video frame sampling."""
    if payload is None:
        raise NotImplementedError("real frame sampling requires a video codec")
    return [hashlib.md5(payload + bytes([i])).digest() for i in range(n_frames)]


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media → (media_id, feature vector, payload size). One Arrow
    pass; metadata columns pruned away before the Python stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, sizes = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                feats.append(_decode_image(b, dim).tolist())
                sizes.append(len(b))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "payload_bytes": sizes}
            )

    return media.select("media_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media:{i}".encode()).digest() * 4
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, f"application/x-fake-{kind}", 64, 64, 1000 + i, payload))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
