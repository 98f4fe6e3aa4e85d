"""String-column encode/decode round-trips (dictionary + FSST + flat paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_to_arrow_spark.column import decode_string_array, encode_string_array

CASES = {
    "low_card_dict": ["web", "books", "code", "web", "web", "wiki"] * 200,
    "unique_flat": [f"doc-{i:08d}" for i in range(500)],
    "empty_strings": ["", "", "a", ""],
    "unicode_bytes": ["Ω", "Ω", "naïve", "日本語テキスト", "emoji 🎉"] * 10,
    "single": ["only-one"],
    "empty_table": [],
    "text_like": [f"the quick brown fox jumps over the lazy dog {i % 7}" for i in range(300)],
}


@pytest.mark.parametrize("name", list(CASES))
def test_string_roundtrip(name):
    arr = pa.array(CASES[name], type=pa.string())
    enc = encode_string_array(arr)
    out = decode_string_array(enc["meta"], enc["payload"])
    assert out.cast(pa.string()).equals(arr)


def test_string_dict_compresses_low_card():
    arr = pa.array(CASES["low_card_dict"], type=pa.string())
    enc = encode_string_array(arr)
    assert enc["codec"] == "str_dict"
    assert len(enc["payload"]) < enc["raw_bytes"] // 4


def test_string_fsst_compresses_text():
    arr = pa.array(CASES["text_like"], type=pa.string())
    enc = encode_string_array(arr)
    assert len(enc["payload"]) < enc["raw_bytes"] // 2
