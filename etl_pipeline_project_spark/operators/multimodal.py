"""Multimodal columns: opaque binary payloads + typed metadata.

North-star extension block. The engine's multimodal data model is:

- payload: a ``binary`` column (image bytes, audio frames, video chunks) —
  Spark shuffles/stores it opaquely; parquet stores it as BYTE_ARRAY.
- metadata: sibling typed columns / a struct (format, n_bytes, checksum) —
  everything filterable stays out of the blob so predicate pushdown and
  column pruning never touch payload bytes. A 100 TB scan that filters on
  ``meta.format`` reads only the metadata column chunks.
- compute: decode / feature-extract / resize / frame-sample run as
  Arrow-batched ``mapInPandas`` over the payload — the only tier where
  bytes enter Python, batch-at-a-time.

The container ships no image/audio codecs, so the decode step is STUBBED
(`decode_image` raises NotImplementedError; `extract_features` computes a
deterministic byte-level feature vector standing in for a real extractor).
The Spark-side plumbing — schema, batching, UDF signatures, metadata
layout — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MULTIMODAL_FIELDS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)


def to_multimodal(df: DataFrame, id_col: str, payload_col: str, fmt: str) -> DataFrame:
    """Wrap a binary payload column into the engine's multimodal layout:
    (id, content binary, meta struct). Metadata derives from the payload
    once at ingestion; downstream filters never touch the blob."""
    content = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.sha2(content, 256).alias("checksum"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """STUB — image decoding requires a codec library not present in this
    container. The Spark plumbing around it (`extract_features`) is real;
    swap this body for PIL/opencv in a full deployment."""
    raise NotImplementedError(
        "image decode requires a codec library (PIL/opencv); not available in this container"
    )


_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, *, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over multimodal payloads via
    ``mapInPandas`` — the real production shape (per-batch, never per-row).

    The feature function is a deterministic stand-in (byte-bucket
    histogram, ``FEATURE_DIM`` buckets, L1-normalized): a real deployment
    replaces only the inner function with decode+embed, keeping the batch
    iterator contract."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            n_bytes = []
            for blob in pdf["content"]:
                # vectorized over the whole payload — this inner loop is the
                # template a real deployment swaps for decode+embed, so it
                # must itself be batch-shaped, never per-byte Python
                arr = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM)
                feats.append((hist / max(arr.size, 1)).tolist())
                n_bytes.append(arr.size)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, schema=_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, *, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """'Frame sampling' over an opaque payload: take ``max_frames`` fixed-
    stride byte offsets per blob — the plumbing shape of video frame
    sampling (explode one row per sampled frame) with a byte-slice standing
    in for a decoded frame."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    exploded = df.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(idx).alias("frame_no"),
        F.col("content"),
    ).filter(F.col("frame_no") * every_n_bytes < F.col("n_bytes"))
    frame = F.substring(F.col("content"), F.col("frame_no") * every_n_bytes + 1, every_n_bytes)
    return exploded.select(
        "doc_id",
        F.col("frame_no").cast("integer").alias("frame_no"),
        F.sha2(frame, 256).alias("frame_checksum"),
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("out_bytes", T.LongType()),
        T.StructField("resized_checksum", T.StringType()),
    ]
)


def resize_payload(df: DataFrame, *, target_bytes: int = 64) -> DataFrame:
    """'Resize' over an opaque payload: stride-decimate each blob to at
    most ``target_bytes`` bytes — the 1-D analog of nearest-neighbor image
    downsampling, carrying the exact Spark plumbing of a real resize
    (Arrow-batched ``mapInPandas``, binary in → binary-derived out, new
    size metadata). A deployment swaps the decimation for decode → resize
    → re-encode and keeps everything else. Stride is computed per blob
    (``ceil(n/target)``), so output size is bounded regardless of input
    skew — no single giant payload can blow an executor's batch memory
    by more than the Arrow batch it arrived in."""
    import hashlib

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, out_bytes, checksums = [], [], []
            for blob in pdf["content"]:
                arr = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                )
                stride = max((arr.size + target_bytes - 1) // target_bytes, 1)
                dec = arr[::stride]
                n_bytes.append(arr.size)
                out_bytes.append(dec.size)
                checksums.append(hashlib.sha256(dec.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "out_bytes": out_bytes,
                    "resized_checksum": checksums,
                }
            )

    return df.mapInPandas(_resize, schema=_RESIZE_SCHEMA)
