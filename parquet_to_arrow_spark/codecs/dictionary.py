"""DICT codec: sorted unique values + bit-packed indices.

The Spark-side materialization of the reference's headline feature —
dictionary-encoded Parquet columns converted to Arrow DictionaryArray without
decoding (reference: src/parquet-to-arrow.cc:25-33, README.md:36-38). Spark
exposes no dictionary type, so the dictionary is explicit: a FoR-packed sorted
value vector (sorted uniques delta-compress extremely well) plus width-
``ceil(log2(card))`` packed indices.

Logical-vs-physical equality contract (reference README.md:93-95): a chunk
encoded with DICT decodes byte-identical to one encoded PLAIN.
"""

from __future__ import annotations

import numpy as np

from . import for_
from .base import bit_width, pack_bits, packed_size, unpack_bits

NAME = "dict"


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    dtype = values.dtype.name
    if len(values) == 0:
        return b"", {"dtype": dtype, "card": 0}
    vmin, vmax = int(values.min()), int(values.max())
    if vmax - vmin < (1 << 16):
        # O(n + range) bincount dictionary — no sort
        offs = (values.astype(np.int64) - vmin).astype(np.intp)
        hist = np.bincount(offs, minlength=vmax - vmin + 1)
        mask = hist > 0
        uniq = (np.flatnonzero(mask) + vmin).astype(values.dtype)
        inverse = (np.cumsum(mask) - 1)[offs]
    else:
        uniq, inverse = np.unique(values, return_inverse=True)
    width = bit_width(len(uniq) - 1)
    val_payload, val_meta = for_.encode(uniq)
    idx_payload = pack_bits(inverse.astype(np.uint64), width)
    meta = {
        "dtype": dtype,
        "card": int(len(uniq)),
        "width": width,
        "val": val_meta,
        "val_bytes": len(val_payload),
    }
    return val_payload + idx_payload, meta


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    card = meta["card"]
    if card == 0:
        return np.empty(0, dtype=np.dtype(meta["dtype"]))
    split = meta["val_bytes"]
    uniq = for_.decode(payload[:split], meta["val"], card)
    idx = unpack_bits(payload[split:], meta["width"], n).astype(np.int64)
    return uniq[idx]


def estimate(stats: dict) -> int:
    if stats["n"] == 0:
        return 0
    card = stats["card"]
    # Sorted-unique FoR payload is bounded by card * value-range width.
    val_bits = bit_width(int(stats["vmax"]) - int(stats["vmin"]))
    return packed_size(card, val_bits) + packed_size(stats["n"], bit_width(card - 1)) + 16
