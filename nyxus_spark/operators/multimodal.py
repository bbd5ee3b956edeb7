"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched mapInPandas.

The decode step is STUBBED (the sandbox ships no image/audio codecs — see the
build brief): `decode_media(..., codec="real")` raises NotImplementedError;
`codec="fake"` produces a deterministic pseudo-decode (shape + checksum derived
from the bytes) so the Spark-side plumbing — schema, partitioning, UDF
signature, batch shape — is real and tested end-to-end.

At 100 TB the binary payloads live in the table (Iceberg with a separate blob
column family / object-store pointers); everything here is a narrow
transformation, so media processing scales with input splits like the token
kernels do.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_type", StringType()),   # image | audio | video
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize deterministic binary payloads from a text column (test
    stand-in for real blobs; encode = utf-8 bytes, metadata from length).

    Zero-length texts are dropped: an empty payload has no decodable content,
    and the downstream oracle's domain (strlen(text) > 0) must match the
    engine's — an empty doc would otherwise produce a Spark-only row."""
    df = df.filter(F.length(F.col(text_col)) > 0)
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id").cast("long") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        (F.length(payload) % 64 + 8).cast("int").alias("meta_width"),
        (F.length(payload) % 48 + 8).cast("int").alias("meta_height"),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_type", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("checksum", LongType()),
        StructField("mean_intensity", LongType()),
    ]
)

PATCH_FIELDS = [
    StructField("patch_digest", LongType()),
    StructField("patch_min", LongType()),
    StructField("patch_max", LongType()),
]


def decode_media(
    df: DataFrame,
    codec: str = "fake",
    resize_to: tuple[int, int] = (16, 16),
    patch: int | None = None,
) -> DataFrame:
    """Decode / feature-extract / resize media payloads.

    codec="real" is a clearly-marked stub (no codecs in this container);
    codec="fake" deterministically derives a pseudo-image from the bytes:
    pixel[i] = payload_bytes cycled through the resize_to shape.

    With ``patch=P`` the decode also PATCHIFIES — the ViT tokenization
    step: the resize_to image splits into (h/P)×(w/P) patches in row-major
    patch order, and each row carries the exact-integer per-patch summary:
    patch_digest = Σ (idx+1)·patch_sum (any single patch's error flips
    it), patch_min/max of the patch sums. P must divide both dimensions.
    """
    w, h = resize_to
    if patch is not None and (w % patch or h % patch):
        raise ValueError(f"patch={patch} must divide resize_to={resize_to}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if codec == "real":
                raise NotImplementedError(
                    "real media decoding requires image/audio codecs not "
                    "present in this environment; use codec='fake'"
                )
            n = len(pdf)
            outw = np.full(n, w, dtype=np.int32)
            outh = np.full(n, h, dtype=np.int32)
            checks = np.empty(n, dtype=np.int64)
            means = np.empty(n, dtype=np.int64)
            pdig = np.zeros(n, dtype=np.int64)
            pmin = np.zeros(n, dtype=np.int64)
            pmax = np.zeros(n, dtype=np.int64)
            for i, payload in enumerate(pdf["payload"].to_numpy()):
                b = bytes(payload or b"")
                checks[i] = zlib.crc32(b)
                arr = np.frombuffer((b * ((w * h) // max(len(b), 1) + 1))[: w * h], dtype=np.uint8)
                means[i] = int(arr.mean()) if arr.size else 0
                if patch is not None and arr.size == w * h:
                    ps = (
                        arr.reshape(h // patch, patch, w // patch, patch)
                        .astype(np.int64).sum(axis=(1, 3)).ravel()
                    )
                    pdig[i] = int(((np.arange(ps.size) + 1) * ps).sum())
                    pmin[i] = int(ps.min())
                    pmax[i] = int(ps.max())
            cols = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "out_width": outw,
                "out_height": outh,
                "checksum": checks,
                "mean_intensity": means,
            }
            if patch is not None:
                cols.update(patch_digest=pdig, patch_min=pmin, patch_max=pmax)
            yield pd.DataFrame(cols)

    schema = DECODED_SCHEMA if patch is None else StructType(
        DECODED_SCHEMA.fields + PATCH_FIELDS
    )
    return df.mapInPandas(gen, schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for video payloads: emit one row per sampled offset —
    pure column expressions (posexplode over byte offsets), no Python."""
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "doc_id",
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes))
            ).alias("frame_idx", "byte_offset"),
        )
    )
