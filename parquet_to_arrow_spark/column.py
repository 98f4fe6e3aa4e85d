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
from .selector import INT_CODECS, rank_int_codecs
from .stats import int_stats

# --- integer arrays ---------------------------------------------------------


def encode_int_array(values: np.ndarray) -> dict:
    """Encode a flat int32/int64 array; returns {codec, meta, payload, ...}."""
    stats = int_stats(values)
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
    """(concatenated utf8 blob, int64 lengths) for a non-null string array."""
    arr = arr.cast(pa.large_utf8())
    buf = arr.buffers()
    offsets = np.frombuffer(buf[1], dtype=np.int64, count=len(arr) + 1, offset=arr.offset * 8)
    data = buf[2].to_pybytes() if buf[2] is not None else b""
    blob = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return blob, lengths


def _encode_blob(blob: bytes) -> dict:
    """Pick FSST vs PLAIN for a byte blob by measured sample compression."""
    if len(blob) == 0:
        return {"codec": "plain_bytes", "meta": {}, "payload": b""}
    symbols = fsst.build_symbol_table(blob)
    sample = blob[:4096]
    if symbols and len(fsst.compress(sample, symbols)) < len(sample):
        payload = fsst.compress(blob, symbols)
        if len(payload) < len(blob):
            return {
                "codec": "fsst_bytes",
                "meta": {"symbols": [s.hex() for s in symbols]},
                "payload": payload,
            }
    return {"codec": "plain_bytes", "meta": {}, "payload": blob}


def _decode_blob(enc_codec: str, meta: dict, payload: bytes) -> bytes:
    if enc_codec == "fsst_bytes":
        return fsst.decompress(payload, [bytes.fromhex(h) for h in meta["symbols"]])
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
        parts["val_blob"] = _encode_blob(vblob)
        parts["val_blob"]["n"] = card
    else:
        mode = "flat"
        parts["lengths"] = encode_int_array(lengths.astype(np.int32))
        parts["blob"] = _encode_blob(blob)
    payload, meta_parts = _pack_parts(parts)
    return {
        "codec": f"str_{mode}",
        "meta": {"mode": mode, "n": n, "card": card, "parts": meta_parts},
        "payload": payload,
        "n": n,
        "raw_bytes": raw_bytes,
    }


def decode_string_array(meta: dict, payload: bytes) -> pa.Array:
    n = meta["n"]
    parts = _unpack_parts(meta["parts"], payload)
    if meta["mode"] == "dict":
        card = meta["card"]
        idx = _decode_part_int(parts["indices"], None)
        vlens = _decode_part_int(parts["val_lengths"], card)
        vblob = _decode_part_blob(parts["val_blob"])
        values = _strings_from(vblob, vlens)
        if n == 0:
            return pa.array([], type=pa.string())
        return pc.take(values, pa.array(idx, type=pa.int64()))
    lengths = _decode_part_int(parts["lengths"], n)
    blob = _decode_part_blob(parts["blob"])
    return _strings_from(blob, lengths)


def _strings_from(blob: bytes, lengths: np.ndarray) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    return pa.Array.from_buffers(
        pa.large_utf8(),
        len(lengths),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(blob)],
    ).cast(pa.string())


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


def _decode_part_blob(part: dict) -> bytes:
    return _decode_blob(part["codec"], part["meta"], part["payload"])
