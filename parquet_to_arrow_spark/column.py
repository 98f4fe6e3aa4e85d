"""Generic column encode/decode: the Transcriber analogue.

The reference builds one typed iterator pipeline per column via a static
physical×logical type dispatch (``makeTranscriberForColumn``, reference:
src/parquet-to-text-stream.cc:746-765). Here the same role is a pure-Python
dispatch over (numpy dtype | utf-8 string) that:

1. computes chunk stats,
2. asks the selector for the ranked codecs,
3. encodes with the winner,
4. applies the *measured* PLAIN guard (actual bytes, not estimates).

String columns are encoded as a composition: lengths (int32 pipeline) + blob
(FSST / PLAIN / DICT-of-strings, where the dictionary indices recurse into the
int pipeline). Everything returns a JSON-serializable ``meta`` and a single
``bytes`` payload so chunk rows stay schema-stable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import fsst
from .codecs.base import bit_width, pack_bits, packed_size, unpack_bits
from .selector import INT_CODECS, rank_int_codecs
from .stats import int_stats

# --- integer arrays ---------------------------------------------------------


def encode_int_array(values: np.ndarray, vmin: int | None = None, vmax: int | None = None) -> dict:
    """Encode a flat int32/int64 array; returns {codec, meta, payload, ...}."""
    stats = int_stats(values, vmin=vmin, vmax=vmax)
    plain_bytes = stats["n"] * stats["itemsize"]
    ranked = rank_int_codecs(stats)
    best = ranked[0][1]
    payload, meta = INT_CODECS[best].encode(values)
    if best != "plain" and len(payload) >= plain_bytes and stats["n"] > 0:
        best = "plain"
        payload, meta = INT_CODECS["plain"].encode(values)
    return {
        "codec": best,
        "meta": meta,
        "payload": payload,
        "n": stats["n"],
        "raw_bytes": plain_bytes,
    }


def decode_int_array(codec: str, meta: dict, payload: bytes, n: int) -> np.ndarray:
    return INT_CODECS[codec].decode(payload, meta, n)


# --- string arrays ----------------------------------------------------------


def _utf8_parts(arr: pa.Array) -> tuple[bytes, np.ndarray]:
    """(concatenated byte blob, int64 lengths) for a non-null string OR
    binary array (identical offsets+data layout; binary skips the utf8
    validation a string cast would apply)."""
    is_bin = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
    arr = arr.cast(pa.large_binary() if is_bin else pa.large_utf8())
    buf = arr.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = buf[2].to_pybytes() if buf[2] is not None else b""
    blob = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return blob, lengths


# FSST compression is ~20x costlier per byte than every other kernel; only
# pay for it when the measured sample win is substantial. Marginal wins are
# left to the container codec (parquet file compression) for free.
_FSST_SAMPLE_GATE = 0.55


def _encode_fixed_planes(blob: bytes, n: int, width: int) -> dict | None:
    """Byte-plane codec for fixed-width strings (zero-padded ids, hashes,
    uuids): transpose the (n, width) byte matrix; constant planes are stored
    once, varying planes FoR-bitpacked to their byte range. Pure numpy —
    ~10x faster than FSST on this shape and usually smaller."""
    if n < 64 or width == 0 or width > 128 or len(blob) != n * width:
        return None
    mat = np.frombuffer(blob, dtype=np.uint8).reshape(n, width)
    lo = mat.min(axis=0).astype(np.int64)
    hi = mat.max(axis=0).astype(np.int64)
    planes = []
    payload = bytearray()
    for c in range(width):
        if lo[c] == hi[c]:
            planes.append({"const": int(lo[c])})
        else:
            w = bit_width(int(hi[c] - lo[c]))
            planes.append({"ref": int(lo[c]), "width": w})
            payload += pack_bits((mat[:, c].astype(np.int64) - lo[c]).astype(np.uint64), w)
    return {
        "codec": "planes_bytes",
        "meta": {"w": width, "planes": planes},
        "payload": bytes(payload),
    }


def _decode_fixed_planes(meta: dict, payload: bytes, n: int) -> bytes:
    width = meta["w"]
    mat = np.empty((n, width), dtype=np.uint8)
    pos = 0
    for c, p in enumerate(meta["planes"]):
        if "const" in p:
            mat[:, c] = p["const"]
        else:
            nbytes = packed_size(n, p["width"])
            vals = unpack_bits(payload[pos : pos + nbytes], p["width"], n)
            mat[:, c] = (vals + np.uint64(p["ref"])).astype(np.uint8)
            pos += nbytes
    return mat.tobytes()


def _encode_blob(blob: bytes, n_strings: int = 0, fixed_width: int = 0) -> dict:
    """Pick byte-planes vs FSST vs PLAIN for a byte blob; planes first (cheap
    and strong on fixed-width ids), FSST by measured sample compression."""
    if len(blob) == 0:
        return {"codec": "plain_bytes", "meta": {}, "payload": b""}
    if fixed_width:
        enc = _encode_fixed_planes(blob, n_strings, fixed_width)
        if enc is not None and len(enc["payload"]) < len(blob):
            return enc
    symbols = fsst.build_symbol_table(blob)
    sample = blob[:4096]
    if symbols and len(fsst.compress(sample, symbols)) < _FSST_SAMPLE_GATE * len(sample):
        payload = fsst.compress(blob, symbols)
        if len(payload) < len(blob):
            return {
                "codec": "fsst_bytes",
                "meta": {"symbols": [s.hex() for s in symbols]},
                "payload": payload,
            }
    return {"codec": "plain_bytes", "meta": {}, "payload": blob}


def _decode_blob(enc_codec: str, meta: dict, payload: bytes, n: int = 0) -> bytes:
    if enc_codec == "fsst_bytes":
        return fsst.decompress(payload, [bytes.fromhex(h) for h in meta["symbols"]])
    if enc_codec == "planes_bytes":
        return _decode_fixed_planes(meta, payload, n)
    return payload


def encode_string_array(arr: pa.Array) -> dict:
    """Encode a string column chunk; dictionary-encodes when it pays off.

    The DICT-of-strings path is the direct analogue of the reference's
    dictionary preservation (README.md:36-38): values blob + lengths +
    bit-packed indices.
    """
    n = len(arr)
    blob, lengths = _utf8_parts(arr)
    raw_bytes = len(blob) + 4 * n
    dict_arr = pc.dictionary_encode(arr)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    card = len(dict_arr.dictionary)
    parts: dict[str, dict] = {}
    if n > 0 and card <= n // 2:
        mode = "dict"
        idx = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vblob, vlens = _utf8_parts(dict_arr.dictionary)
        parts["indices"] = encode_int_array(idx)
        parts["val_lengths"] = encode_int_array(vlens.astype(np.int32))
        vfw = int(vlens[0]) if card and (vlens == vlens[0]).all() else 0
        parts["val_blob"] = _encode_blob(vblob, card, vfw)
        parts["val_blob"]["n"] = card
    else:
        mode = "flat"
        parts["lengths"] = encode_int_array(lengths.astype(np.int32))
        fw = int(lengths[0]) if n and (lengths == lengths[0]).all() else 0
        parts["blob"] = _encode_blob(blob, n, fw)
    payload, meta_parts = _pack_parts(parts)
    is_bin = pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type)
    return {
        "codec": f"str_{mode}",
        "meta": {
            "mode": mode,
            "n": n,
            "card": card,
            "binary": is_bin,
            "parts": meta_parts,
        },
        "payload": payload,
        "n": n,
        "raw_bytes": raw_bytes,
    }


def decode_string_array(meta: dict, payload: bytes) -> pa.Array:
    n = meta["n"]
    binary = bool(meta.get("binary", False))
    parts = _unpack_parts(meta["parts"], payload)
    if meta["mode"] == "dict":
        card = meta["card"]
        idx = _decode_part_int(parts["indices"], None)
        vlens = _decode_part_int(parts["val_lengths"], card)
        vblob = _decode_part_blob(parts["val_blob"], card)
        values = _strings_from(vblob, vlens, binary)
        if n == 0:
            return pa.array([], type=pa.binary() if binary else pa.string())
        return pc.take(values, pa.array(idx, type=pa.int64()))
    lengths = _decode_part_int(parts["lengths"], n)
    blob = _decode_part_blob(parts["blob"], n)
    return _strings_from(blob, lengths, binary)


def _strings_from(blob: bytes, lengths: np.ndarray, binary: bool = False) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.large_binary() if binary else pa.large_utf8(),
        len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
    ).cast(pa.binary() if binary else pa.string())


# --- part (de)multiplexing ---------------------------------------------------


def _pack_parts(parts: dict[str, dict]) -> tuple[bytes, dict]:
    """Concatenate sub-payloads; record (codec, meta, offset, length, n)."""
    blob = bytearray()
    meta_parts: dict[str, dict] = {}
    for name, enc in parts.items():
        off = len(blob)
        blob += enc["payload"]
        meta_parts[name] = {
            "codec": enc["codec"],
            "meta": enc["meta"],
            "offset": off,
            "length": len(enc["payload"]),
            "n": enc.get("n", 0),
        }
    return bytes(blob), meta_parts


def _unpack_parts(meta_parts: dict, payload: bytes) -> dict[str, dict]:
    out = {}
    for name, p in meta_parts.items():
        out[name] = dict(p, payload=payload[p["offset"] : p["offset"] + p["length"]])
    return out


def _decode_part_int(part: dict, n: int | None) -> np.ndarray:
    count = part["n"] if n is None else n
    return decode_int_array(part["codec"], part["meta"], part["payload"], count)


def _decode_part_blob(part: dict, n: int = 0) -> bytes:
    return _decode_blob(part["codec"], part["meta"], part["payload"], n)
