"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not in this container, so the decode
kernels are STUBBED (deterministic fake features clearly marked), but the
Spark-side plumbing is real and tested: binary columns, metadata structs,
Arrow-batched mapInPandas with explicit output schemas, and partition-size
control so a 100 TB blob column never materializes more than a batch per
task.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, n_bytes long"
)
FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feat array<float>"

_FEAT_DIM = 8


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model the documents table as an opaque-binary media table (the shape a
    real image/audio table would have): payload = UTF-8 bytes, typed meta."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.concat(F.lit("text/plain;lang="), F.col("lang")).alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """STUB: real image/audio decode is unavailable in this container.

    Raises for genuinely binary media; text payloads get a deterministic
    fake feature vector so the distributed plumbing is exercisable.
    """
    if not media_type.startswith("text/"):
        raise NotImplementedError(
            "binary media decode requires codec libraries not present in this image"
        )
    arr = np.frombuffer(payload, dtype=np.uint8)
    # deterministic fake "features": byte-histogram moments
    feat = np.zeros(_FEAT_DIM, dtype=np.float32)
    if len(arr):
        feat[0] = len(arr)
        feat[1] = float(arr.mean())
        feat[2] = float(arr.min())
        feat[3] = float(arr.max())
        feat[4:8] = np.bincount(arr % 4, minlength=4).astype(np.float32)
    return feat


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: the real pipeline shape
    (mapInPandas, explicit schema, no driver collect)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m) for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feat": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def media_meta(spark, sf_dir) -> DataFrame:
    """Metadata-only pass over the media table (never touches payload bytes —
    column pruning keeps the blob column out of the scan)."""
    return documents_as_media(spark, sf_dir).select("doc_id", "media_type", "n_bytes")
