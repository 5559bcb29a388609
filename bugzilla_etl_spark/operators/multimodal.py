"""Multimodal column plumbing: opaque ``binary`` media + typed metadata.

The decode step for real image/audio/video libs is STUBBED (the codecs
are not in this container — see ``decode_image``), but the Spark-side
plumbing is real and tested: schema, partitioning, Arrow batch shape,
``mapInPandas`` UDF signatures, and deterministic fake feature
extraction so the pipeline runs end-to-end.

``media_from_documents`` manufactures a media table by encoding text to
bytes — byte-for-byte reproducible in SQL, so the plumbing has a DuckDB
oracle too.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, width int, height int, "
    "sample_rate int, n_frames int"
)
FEATURE_SCHEMA = "media_id long, kind string, byte_len int, feature array<float>"
FRAME_SCHEMA = "media_id long, frame_idx int, frame binary"


def decode_image(buf: bytes) -> "np.ndarray":
    """Real image decode — NOT AVAILABLE in this container.

    On a cluster with Pillow/libvips installed, replace the body with
    ``np.asarray(PIL.Image.open(io.BytesIO(buf)))``. Kept as an explicit
    stub so callers fail loudly rather than silently fake-decoding.
    """
    raise NotImplementedError("image codecs not installed in this environment")


def fake_feature(buf: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256-seeded floats.

    Exercises the exact batch/shape/schema contract a real extractor
    (CLIP/encodec/...) would use, with reproducible output."""
    h = hashlib.sha256(buf).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float32) / np.float32(2**32)).astype(np.float32)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manufacture an opaque-binary media table from documents."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("blob").alias("kind"),
        F.encode("text", "UTF-8").alias("media"),
    )


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of binary in,
    fixed-dim float vectors out. This is the real plumbing a decode/
    embed stage uses; swap ``fake_feature`` for the real model call."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_feature(bytes(b), dim) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(bytes(b)) for b in pdf["media"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256, max_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: split each blob into fixed-size 'frames'
    (a real video path would seek keyframes; the partition/explode shape
    is identical)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(b)
                for i in range(min(max_frames, max(1, len(raw) // frame_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-checkable slice of the plumbing: binary length + frame count
    + first-byte tag per media row."""
    media = media_from_documents(spark, sf_dir)
    return media.select(
        "media_id",
        F.octet_length("media").alias("byte_len"),
        F.greatest(F.floor(F.octet_length("media") / 256), F.lit(1)).alias("n_frames"),
        F.ascii(F.substring(F.col("media").cast("string"), 1, 1)).alias("first_byte"),
    ).filter(F.col("media_id") < 100)


ORACLE_MM = """
SELECT doc_id AS media_id,
       octet_length(encode(text)) AS byte_len,
       greatest(CAST(FLOOR(octet_length(encode(text)) / 256) AS BIGINT), 1) AS n_frames,
       ascii(substr(text, 1, 1)) AS first_byte
FROM documents WHERE doc_id < 100
"""


QUERIES = {"mm_binary_metadata": mm_binary_metadata}
ORACLE = {"mm_binary_metadata": ORACLE_MM}
