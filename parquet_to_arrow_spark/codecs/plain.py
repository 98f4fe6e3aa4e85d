"""PLAIN codec: raw little-endian values, the universal fallback.

The reference's analogue is reading a column with no dictionary page into a
dense Arrow buffer (reference: src/parquet-to-arrow.cc:25-33 — the
``set_read_dictionary(i, False)`` branch). Guaranteed round-trip for any
input, including the full-range-int32 fixture where every lightweight codec
degenerates.
"""

from __future__ import annotations

import numpy as np

from .base import dtype_info

NAME = "plain"


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    _, _, itemsize = dtype_info(values.dtype.name)
    return values.tobytes(), {"dtype": values.dtype.name}


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    signed, _, _ = dtype_info(meta["dtype"])
    return np.frombuffer(payload, dtype=signed, count=n)


def estimate(stats: dict) -> int:
    return stats["n"] * stats["itemsize"]
