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

    Value ``i`` occupies bit range [i*width, (i+1)*width), LSB-first.
    Non-byte widths use a phase-strided word packer: values whose bit
    offset modulo 64 coincides (there are at most 64 such phases) are OR-ed
    into the output words with two strided vector ops — O(n) memory-bound,
    no per-value Python and no n×width bit matrix.
    """
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width in _BYTE_WIDTHS:
        return values.astype(_BYTE_WIDTHS[width], copy=False).tobytes()
    vals = values.astype(np.uint64, copy=False)
    import math

    p = 64 // math.gcd(width, 64)  # phases per period
    q = p * width // 64  # words per period
    periods = (n + p - 1) // p
    words = np.zeros(periods * q + 1, dtype=np.uint64)
    for k in range(p):
        elems = vals[k::p]
        if len(elems) == 0:
            break
        bitpos = k * width
        lo, w0 = bitpos % 64, bitpos // 64
        tgt = words[w0::q][: len(elems)]
        tgt |= elems << np.uint64(lo)
        if lo + width > 64:
            tgt2 = words[w0 + 1 :: q][: len(elems)]
            tgt2 |= elems >> np.uint64(64 - lo)
    nbytes = (n * width + 7) // 8
    return words.tobytes()[:nbytes]


def unpack_bits(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 values."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _BYTE_WIDTHS:
        out = np.frombuffer(payload, dtype=_BYTE_WIDTHS[width], count=n)
        return out.astype(np.uint64, copy=False)
    import math

    p = 64 // math.gcd(width, 64)
    q = p * width // 64
    periods = (n + p - 1) // p
    buf = payload.ljust((periods * q + 1) * 8, b"\x00")
    words = np.frombuffer(buf, dtype=np.uint64, count=periods * q + 1)
    out = np.empty(n, dtype=np.uint64)
    mask = np.uint64((1 << width) - 1)
    for k in range(p):
        m = len(range(k, n, p))
        if m == 0:
            break
        bitpos = k * width
        lo, w0 = bitpos % 64, bitpos // 64
        elems = words[w0::q][:m] >> np.uint64(lo)
        if lo + width > 64:
            elems = elems | (words[w0 + 1 :: q][:m] << np.uint64(64 - lo))
        out[k::p] = elems & mask
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
