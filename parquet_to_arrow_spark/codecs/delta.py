"""DELTA codec: consecutive differences, then frame-of-reference bit-packing.

The win FoR cannot reach on sorted/near-sorted columns (ids, timestamps,
offsets): a sorted 8M-row id chunk spans 23 bits under FoR but its steps are
0/1, so delta+FoR packs 1 bit per value. Differences are computed in
wrap-around unsigned arithmetic (exact mod 2^w, same discipline as
codecs.for_ — the full-range-int32 fixture round-trips), reinterpreted as
signed so descending steps stay narrow, then FoR-packed against the minimum
delta. Decode is one unpack + one modular cumsum — pure numpy, no per-row
Python (reference round-trip contract: README.md:93-95, bit-identical values).
"""

from __future__ import annotations

import numpy as np

from .base import (
    bit_width,
    dtype_info,
    from_unsigned_deltas,
    pack_bits,
    packed_size,
    to_unsigned_deltas,
    unpack_bits,
)

NAME = "delta"


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    dtype = values.dtype.name
    signed, unsigned, _ = dtype_info(dtype)
    n = len(values)
    if n == 0:
        return b"", {"dtype": dtype, "first": 0, "dref": 0, "width": 0}
    first = int(values[0])
    if n == 1:
        return b"", {"dtype": dtype, "first": first, "dref": 0, "width": 0}
    u = values.view(unsigned) if values.dtype.kind == "i" else values.astype(unsigned)
    ds = (u[1:] - u[:-1]).view(signed)  # wrap-around, exact mod 2^w
    dref = int(ds.min())
    width = bit_width(int(ds.max()) - dref)
    packed = pack_bits(to_unsigned_deltas(ds, dref), width)
    return packed, {"dtype": dtype, "first": first, "dref": dref, "width": width}


def decode(payload: bytes, meta: dict, n: int) -> np.ndarray:
    dtype = meta["dtype"]
    signed, unsigned, _ = dtype_info(dtype)
    if n == 0:
        return np.empty(0, dtype=signed)
    out = np.empty(n, dtype=unsigned)
    out[0] = np.array(meta["first"], dtype=np.int64).view(np.uint64).astype(unsigned)
    if n > 1:
        ds = from_unsigned_deltas(unpack_bits(payload, meta["width"], n - 1), meta["dref"], dtype)
        # modular prefix sum in the unsigned twin: dtype pinned so uint32
        # wraps at 2^32 instead of promoting
        np.cumsum(ds.view(unsigned), dtype=unsigned, out=out[1:])
        out[1:] += out[0]
    return out.view(signed)


def estimate(stats: dict) -> int:
    if stats["n"] == 0:
        return 0
    # delta_width comes from the stats prefix sample (like n_runs): a spike
    # outside the sample makes the estimate optimistic, never the encoding
    # wrong — encode() derives exact widths and the PLAIN guard bounds misses
    return packed_size(stats["n"] - 1, stats.get("delta_width", 64)) + 24
