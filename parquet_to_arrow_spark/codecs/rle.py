"""RLE codec: run-length encoding with cascaded FoR-packed run values.

Runs are found vectorized (one ``!=`` + ``flatnonzero`` pass); run values are
frame-of-reference bit-packed and run lengths (minus 1) bit-packed. Handles
the single-run degenerate column mandated by the north rule: one run, one
value, ~0 payload bits.
"""

from __future__ import annotations

import numpy as np

from . import bitpack, for_
from .base import bit_width, packed_size

NAME = "rle"


def _runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = len(values)
    change = np.flatnonzero(values[1:] != values[:-1])
    starts = np.concatenate((np.zeros(1, dtype=np.int64), change + 1))
    bounds = np.concatenate((starts, np.array([n], dtype=np.int64)))
    lengths = np.diff(bounds)
    return values[starts], lengths


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    dtype = values.dtype.name
    if len(values) == 0:
        return b"", {"dtype": dtype, "n_runs": 0}
    run_values, lengths = _runs(values)
    val_payload, val_meta = for_.encode(run_values)
    len_payload, len_meta = bitpack.encode((lengths - 1).astype(np.int64))
    meta = {
        "dtype": dtype,
        "n_runs": int(len(run_values)),
        "val": val_meta,
        "len": len_meta,
        "val_bytes": len(val_payload),
    }
    return val_payload + len_payload, meta


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    k = meta["n_runs"]
    if k == 0:
        signed = np.dtype(meta["dtype"])
        return np.empty(0, dtype=signed)
    split = meta["val_bytes"]
    run_values = for_.decode(payload[:split], meta["val"], k)
    lengths = bitpack.decode(payload[split:], meta["len"], k) + 1
    return np.repeat(run_values, lengths)


def estimate(stats: dict) -> int:
    k = stats["n_runs"]
    if stats["n"] == 0:
        return 0
    val_bits = bit_width(int(stats["vmax"]) - int(stats["vmin"]))
    len_bits = bit_width(int(stats["max_run"]) - 1)
    return packed_size(k, val_bits) + packed_size(k, len_bits) + 16
