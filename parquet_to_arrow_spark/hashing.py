"""Vectorized content hashing shared by verification and chunk checksums.

Order-sensitive within a row (position-salted splitmix64 per token),
order-insensitive across rows (wrap-around sum), so a chunk checksum is
invariant under the encoder's content-clustering row reorder but any token
value/position damage changes it.
"""

from __future__ import annotations

import numpy as np

_FNV_PRIME = np.uint64(0x100000001B3)


def row_token_hashes(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """int64 hash per row of its token array (vectorized, no per-row Python)."""
    n = len(lengths)
    lengths = lengths.astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    if total:
        x = (
            values.view(np.uint64)
            if values.dtype == np.int64
            else values.astype(np.uint64)
        )
        # z = x + C*(within+1), computed as x + C*(arange+1) - repeat(C*offset)
        # (same values, but ~half the 16-byte passes of materializing
        # row_of/within, and the mix runs in-place — this is the verification
        # hot loop, 2.7x faster than the naive form)
        c = np.uint64(0x9E3779B97F4A7C15)
        z = np.arange(1, total + 1, dtype=np.uint64)
        z *= c
        z -= np.repeat(offsets[:-1].astype(np.uint64) * c, lengths)
        z += x
        t = z >> np.uint64(30)
        z ^= t
        z *= np.uint64(0xBF58476D1CE4E5B9)
        np.right_shift(z, np.uint64(27), out=t)
        z ^= t
        z *= np.uint64(0x94D049BB133111EB)
        np.right_shift(z, np.uint64(31), out=t)
        z ^= t
        sums = np.zeros(n, dtype=np.uint64)
        nonempty = lengths > 0
        if nonempty.any():
            sums[nonempty] = np.add.reduceat(z, offsets[:-1][nonempty])
    else:
        sums = np.zeros(n, dtype=np.uint64)
    h = (sums ^ (lengths.astype(np.uint64) * _FNV_PRIME)) * _FNV_PRIME
    return h.view(np.int64)


def chunk_checksum(values: np.ndarray, lengths: np.ndarray) -> int:
    """int64 checksum of a chunk's stored token content (crc32 over the flat
    value buffer and the lengths buffer — C speed; decode reproduces the
    same arrays in the same stored order, so order sensitivity is fine)."""
    import zlib

    a = zlib.crc32(np.ascontiguousarray(values).data)
    b = zlib.crc32(np.ascontiguousarray(lengths.astype(np.int64, copy=False)).data)
    v = (a << 32) | b
    return v - (1 << 64) if v >= (1 << 63) else v
