"""BITPACK codec: width-w little-endian bit packing of non-negative ints.

Only applicable when ``min >= 0``; the selector guards this. Width is the
exact bit-length of the chunk maximum — the same per-chunk width decision
Parquet's RLE_DICTIONARY hybrid makes per page, re-derived from chunk stats
(cf. the reference's per-column metadata probe, src/parquet-to-arrow.cc:25-33).
"""

from __future__ import annotations

import numpy as np

from .base import bit_width, dtype_info, pack_bits, packed_size, unpack_bits

NAME = "bitpack"


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    dtype = values.dtype.name
    if len(values) == 0:
        return b"", {"dtype": dtype, "width": 0}
    vmax = int(values.max())
    vmin = int(values.min())
    if vmin < 0:
        raise ValueError("bitpack requires non-negative values (use 'for')")
    width = bit_width(vmax)
    _, unsigned, _ = dtype_info(dtype)
    return pack_bits(values.view(unsigned), width), {"dtype": dtype, "width": width}


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    signed, _, _ = dtype_info(meta["dtype"])
    return unpack_bits(payload, meta["width"], n).astype(signed)


def estimate(stats: dict) -> int:
    if stats["n"] == 0:
        return 0
    if stats["vmin"] < 0:
        return 1 << 62  # inapplicable
    return packed_size(stats["n"], bit_width(stats["vmax"]))
