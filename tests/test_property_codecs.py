"""Property-based round-trip tests (hypothesis): any int32/int64 content,
any codec the selector picks, decode must be bit-identical — the
reference's round-trip contract as a universal property."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from parquet_to_arrow_spark.codecs import ALL
from parquet_to_arrow_spark.column import decode_int_array, encode_int_array

int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)
int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=120, deadline=None)
@given(st.lists(int32s, max_size=400))
def test_int32_roundtrip_any_content(xs):
    values = np.array(xs, dtype=np.int32)
    enc = encode_int_array(values)
    out = decode_int_array(enc["codec"], enc["meta"], enc["payload"], len(values))
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, values)
    assert len(enc["payload"]) <= max(values.nbytes, 1)


@settings(max_examples=60, deadline=None)
@given(st.lists(int64s, max_size=200))
def test_int64_roundtrip_any_content(xs):
    values = np.array(xs, dtype=np.int64)
    enc = encode_int_array(values)
    out = decode_int_array(enc["codec"], enc["meta"], enc["payload"], len(values))
    assert out.dtype == np.int64
    np.testing.assert_array_equal(out, values)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=50),
    st.lists(st.integers(min_value=1, max_value=64), min_size=1, max_size=50),
)
def test_rle_runs_roundtrip(vals, lens):
    k = min(len(vals), len(lens))
    values = np.repeat(np.array(vals[:k], dtype=np.int32), np.array(lens[:k]))
    payload, meta = ALL["rle"].encode(values)
    np.testing.assert_array_equal(ALL["rle"].decode(payload, meta, len(values)), values)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=2000))
def test_fsst_any_bytes_roundtrip(data):
    from parquet_to_arrow_spark.codecs import fsst

    symbols = fsst.build_symbol_table(data)
    assert fsst.decompress(fsst.compress(data, symbols), symbols) == data
