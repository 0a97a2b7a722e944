"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched kernels.

The decode libraries (Pillow/ffmpeg/soundfile) are NOT in this
container, so the decode step is STUBBED (clearly-marked deterministic
fake, or NotImplementedError when a real decode is demanded).  What IS
real and tested: the schema, the mapInPandas batch shape, the
partitioning behavior, and the feature-extraction contract — the parts
Spark owns.  Swapping the fake for a real decoder touches exactly one
function (``_decode_image_stub``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["MEDIA_SCHEMA", "IMAGE_FEATURES_SCHEMA", "image_features",
           "frame_sample_plan"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),     # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mime", T.StringType(), True),
    ]), True),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("phash", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def _decode_image_stub(payload: bytes, real_decode: bool = False):
    """STUB: image decode.

    ``real_decode=True`` is the hook for a Pillow/torchvision decoder —
    not available in this environment by design.  The deterministic fake
    below keeps the Spark plumbing testable: a stable pseudo-hash stands
    in for the perceptual hash a real decoder would produce.
    """
    if real_decode:
        raise NotImplementedError(
            "image decode requires Pillow/libvips — not installed; "
            "wire a real decoder here for production")
    digest = hashlib.sha1(payload or b"").hexdigest()
    return {"phash": digest[:16],
            "width": int(digest[16:20], 16) % 4096,
            "height": int(digest[20:24], 16) % 4096}


def image_features(df: DataFrame, *, payload_col: str = "payload",
                   id_col: str = "media_id") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, features out.

    Batch-level processing only — decode state (model weights, codec
    contexts) initializes once per iterator, never per row.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task init happens HERE (amortized across all batches)
        for pdf in batches:
            feats = [_decode_image_stub(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col].astype(str),
                "n_bytes": pdf[payload_col].map(lambda p: len(p) if p is not None else 0),
                "phash": [f["phash"] for f in feats],
                "width": [f["width"] for f in feats],
                "height": [f["height"] for f in feats],
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(duration_ms: int, every_ms: int = 1000) -> list[int]:
    """Deterministic frame-sampling timestamps for a video payload —
    the pure planning half of a frame extractor (decode half stubbed)."""
    if duration_ms <= 0 or every_ms <= 0:
        return []
    return list(range(0, duration_ms, every_ms))
