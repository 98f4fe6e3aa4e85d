"""FOR codec: frame-of-reference — subtract the chunk minimum, bit-pack deltas.

Handles negative values and the full-range-int32 fixture: deltas are computed
in wrap-around unsigned arithmetic so ``max - min`` up to 2**32-1 (int32) or
2**64-1 (int64) is exact (north rule: "overflow-safe FoR").
"""

from __future__ import annotations

import numpy as np

from .base import (
    bit_width,
    from_unsigned_deltas,
    pack_bits,
    packed_size,
    to_unsigned_deltas,
    unpack_bits,
)

NAME = "for"


def _delta_range(stats_or_values) -> int:
    """max - min as an exact Python int (no numpy overflow)."""
    if isinstance(stats_or_values, dict):
        return int(stats_or_values["vmax"]) - int(stats_or_values["vmin"])
    return int(stats_or_values.max()) - int(stats_or_values.min())


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    dtype = values.dtype.name
    if len(values) == 0:
        return b"", {"dtype": dtype, "ref": 0, "width": 0}
    ref = int(values.min())
    width = bit_width(_delta_range(values))
    deltas = to_unsigned_deltas(values, ref)
    return pack_bits(deltas, width), {"dtype": dtype, "ref": ref, "width": width}


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    deltas = unpack_bits(payload, meta["width"], n)
    return from_unsigned_deltas(deltas, meta["ref"], meta["dtype"])


def estimate(stats: dict) -> int:
    if stats["n"] == 0:
        return 0
    return packed_size(stats["n"], bit_width(_delta_range(stats))) + 8
