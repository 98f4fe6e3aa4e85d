"""Shared bit-level kernels for the lightweight-compression codecs.

All kernels are pure numpy: they take/return numpy arrays and ``bytes`` and are
fully deterministic (codec choice + payload are pure functions of the input
values). This replaces the reference's single-threaded determinism
(reference: src/parquet-to-arrow.cc:16, src/common.cc:49) with
content-deterministic encoding that is safe under Spark's task parallelism.

No per-row Python anywhere: everything operates on flat buffers
(cf. the values/validity dense-array model in reference src/parquet-diff.cc:166-174).
"""

from __future__ import annotations

import numpy as np

# Widths with a native numpy dtype: packing is a cast, not bit surgery.
_BYTE_WIDTHS = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def bit_width(max_value: int) -> int:
    """Number of bits needed to represent non-negative ``max_value``."""
    if max_value < 0:
        raise ValueError("bit_width requires a non-negative value")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit little-endian codes.

    ``values`` may be any unsigned (or non-negative signed) integer dtype.
    ``width == 0`` encodes an all-zero column as zero bytes.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width in _BYTE_WIDTHS:
        return values.astype(_BYTE_WIDTHS[width], copy=False).tobytes()
    vals = values.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    # (n, width) bit matrix, row-major ravel => value i occupies bits
    # [i*width, (i+1)*width) of the stream; packed LSB-first.
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _BYTE_WIDTHS:
        out = np.frombuffer(payload, dtype=_BYTE_WIDTHS[width], count=n)
        return out.astype(np.uint64, copy=False)
    bits = np.unpackbits(
        np.frombuffer(payload, dtype=np.uint8), count=n * width, bitorder="little"
    ).reshape(n, width)
    out = np.zeros(n, dtype=np.uint64)
    for b in range(width):
        out |= bits[:, b].astype(np.uint64) << np.uint64(b)
    return out


def packed_size(n: int, width: int) -> int:
    """Bytes used by ``pack_bits`` for ``n`` values at ``width`` bits."""
    if width == 0 or n == 0:
        return 0
    if width in _BYTE_WIDTHS:
        return n * (width // 8)
    return (n * width + 7) // 8


_SIGNED_INFO = {
    "int32": (np.int32, np.uint32, 4),
    "int64": (np.int64, np.uint64, 8),
}


def dtype_info(dtype_name: str):
    """(signed dtype, unsigned twin, byte size) for a supported int dtype."""
    try:
        return _SIGNED_INFO[dtype_name]
    except KeyError:  # pragma: no cover - guarded by callers
        raise ValueError(f"unsupported integer dtype: {dtype_name}") from None


def to_unsigned_deltas(values: np.ndarray, ref: int) -> np.ndarray:
    """``values - ref`` in wrap-around unsigned arithmetic (overflow-safe).

    For int32/int64 inputs the delta ``max - min`` can exceed the signed
    range (the north rule's full-range-int32 fixture); two's-complement
    wrap-around in the unsigned twin dtype makes subtraction exact.
    """
    _, unsigned, _ = dtype_info(values.dtype.name)
    u = values.view(unsigned) if values.dtype.kind == "i" else values.astype(unsigned)
    return u - np.array(ref, dtype=np.int64).view(np.uint64).astype(unsigned)


def from_unsigned_deltas(deltas: np.ndarray, ref: int, dtype_name: str) -> np.ndarray:
    """Inverse of :func:`to_unsigned_deltas`."""
    signed, unsigned, _ = dtype_info(dtype_name)
    d = deltas.astype(unsigned, copy=False)
    base = np.array(ref, dtype=np.int64).view(np.uint64).astype(unsigned)
    return (d + base).view(signed)
