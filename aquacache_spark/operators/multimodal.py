"""Multimodal (image/audio/video) column plumbing.

Design for 100 TB multimodal corpora: media are opaque ``binary``
columns with typed metadata alongside (mime, width/height, duration…).
Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes never round-trip through Python row by
row, and the pipeline schema is explicit at every step.

The *decode* step itself is STUBBED here (no image/audio codecs in
this container): ``decoder=None`` uses a deterministic fake (byte-level
stats standing in for pixel stats) so the Spark-side plumbing — schema,
batching, partition sizing — is real and testable; pass a real decoder
callable (e.g. PIL/librosa based) in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("mean_byte", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def _fake_decode(blob: bytes) -> list[float]:
    """Deterministic stand-in for pixel decode: 8 byte-histogram moments."""
    if not blob:
        return [0.0] * 8
    return [
        sum(b for b in blob[i::8]) / max(len(blob[i::8]), 1) / 255.0
        for i in range(8)
    ]


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "content",
    decoder: Optional[Callable[[bytes], list[float]]] = None,
) -> DataFrame:
    """Binary column -> per-item feature rows, Arrow-batched.

    ``decoder`` maps raw bytes to a feature vector; None selects the
    deterministic fake (decode libs absent here — see module docstring).
    """
    decode = decoder or _fake_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[blob_col]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                "sha256": blobs.map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()
                ),
                "mean_byte": blobs.map(
                    lambda b: (sum(b) / len(b)) if b else 0.0
                ),
                "feature": blobs.map(lambda b: decode(b or b"")),
            })

    return df.select(id_col, blob_col).mapInPandas(batches, FEATURE_SCHEMA)
