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
           "frame_sample_plan", "decode_ppm"]

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


def decode_ppm(payload: bytes):
    """Pure-Python decoder for binary PPM (P6, maxval ≤ 255): returns
    (width, height, rgb_bytes).  The one dependency-free raster format —
    it proves the swap-one-function decode contract with REAL pixels;
    production swaps in Pillow/libvips behind the same signature."""
    if not payload or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic, width, height, maxval — whitespace/comment separated
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(payload):
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw samples
    width, height, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = width * height * 3
    pixels = payload[i:i + n]
    if len(pixels) != n:
        raise ValueError(f"truncated PPM: want {n} bytes, have {len(pixels)}")
    return width, height, pixels


def _ahash(pixels: bytes, width: int, height: int, grid: int = 8) -> str:
    """Average-hash over an 8×8 box-sampled grayscale downscale —
    a real perceptual hash from real pixels, dependency-free."""
    cells = []
    for gy in range(grid):
        y0, y1 = gy * height // grid, max((gy + 1) * height // grid, gy * height // grid + 1)
        for gx in range(grid):
            x0, x1 = gx * width // grid, max((gx + 1) * width // grid, gx * width // grid + 1)
            tot = cnt = 0
            for y in range(y0, min(y1, height)):
                row = (y * width + x0) * 3
                for x in range(x0, min(x1, width)):
                    p = row + (x - x0) * 3
                    tot += pixels[p] + pixels[p + 1] + pixels[p + 2]
                    cnt += 3
            cells.append(tot / cnt if cnt else 0.0)
    mean = sum(cells) / len(cells)
    bits = 0
    for k, c in enumerate(cells):
        if c > mean:
            bits |= 1 << k
    return f"{bits:016x}"


def _decode_image_stub(payload: bytes, real_decode: bool = False):
    """Image decode: real path for PPM (P6), deterministic fake otherwise.

    ``real_decode=True`` decodes binary PPM with the pure-Python decoder
    above (real pixels → real average-hash); other formats need
    Pillow/libvips — not installed in this environment — and raise
    ``NotImplementedError`` so the gap is explicit, never silent.

    The fake path (default) keeps the Spark plumbing testable at any
    scale: a stable sha256-based pseudo-hash and length-derived
    dimensions stand in for decoder output.  Every component is
    expressible in ANSI SQL, so the driver oracle recomputes it
    independently (sha256 over the payload TEXT — the fixture payloads
    are ASCII by construction).
    """
    if real_decode:
        if payload and payload.startswith(b"P6"):
            w, h, pixels = decode_ppm(payload)
            return {"phash": _ahash(pixels, w, h), "width": w, "height": h}
        raise NotImplementedError(
            "non-PPM image decode requires Pillow/libvips — not installed; "
            "wire a real decoder here for production")
    n = len(payload or b"")
    digest = hashlib.sha256(payload or b"").hexdigest()
    return {"phash": digest[:16],
            "width": (n * 7919) % 4096,
            "height": (n * 104729 + 13) % 4096}


def image_features(df: DataFrame, *, payload_col: str = "payload",
                   id_col: str = "media_id", real_decode: bool = False) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, features out.

    Batch-level processing only — decode state (model weights, codec
    contexts) initializes once per iterator, never per row.
    ``real_decode=True`` runs the real PPM decoder (see
    ``_decode_image_stub``).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-task init happens HERE (amortized across all batches)
        for pdf in batches:
            feats = [_decode_image_stub(p, real_decode=real_decode)
                     for p in pdf[payload_col]]
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
