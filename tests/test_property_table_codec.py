"""Property-based round-trips for the GENERIC table codec: any flat schema
drawn from the supported type lattice, any values (nulls, NaN, signed zero,
extremes, empty/unicode strings, pre-epoch dates), decode bit-identical —
the hypothesis analogue of the reference's exhaustive fixture matrix
(tests/test_parquet_to_arrow.py)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_to_arrow_spark.table_codec import decode_table_row, encode_table_batch


def _col_strategy(t):
    if pa.types.is_boolean(t):
        base = st.booleans()
    elif pa.types.is_integer(t):
        info = np.iinfo(t.to_pandas_dtype())
        base = st.integers(int(info.min), int(info.max))
    elif pa.types.is_floating(t):
        base = st.floats(allow_nan=True, allow_infinity=True, width=32 if t == pa.float32() else 64)
    elif pa.types.is_string(t):
        base = st.text(max_size=12)
    elif pa.types.is_binary(t):
        base = st.binary(max_size=16)
    elif pa.types.is_timestamp(t):
        base = st.datetimes(dt.datetime(1900, 1, 1), dt.datetime(2200, 1, 1))
    else:  # date32
        base = st.dates(dt.date(1800, 1, 1), dt.date(2500, 1, 1))
    return st.one_of(st.none(), base)


TYPES = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
    pa.bool_(), pa.float32(), pa.float64(),
    pa.string(), pa.binary(), pa.timestamp("us"), pa.date32(),
]


@st.composite
def flat_batches(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(0, 40))
    arrays, names = [], []
    for i in range(n_cols):
        t = draw(st.sampled_from(TYPES))
        vals = draw(st.lists(_col_strategy(t), min_size=n_rows, max_size=n_rows))
        arrays.append(pa.array(vals, type=t))
        names.append(f"c{i}_{t}")
    return pa.RecordBatch.from_arrays(arrays, names=names)


def _bit_equal(a: pa.RecordBatch, b: pa.RecordBatch) -> None:
    assert a.schema == b.schema
    for i in range(a.num_columns):
        for va, vb in zip(a.column(i).to_pylist(), b.column(i).to_pylist()):
            if isinstance(va, float) and va != va:
                assert vb != vb
            else:
                assert va == vb, (a.schema.names[i], va, vb)


@settings(max_examples=60, deadline=None)
@given(flat_batches())
def test_any_flat_schema_roundtrips(batch):
    enc = encode_table_batch(batch, "prop")
    i = enc.schema.get_field_index
    out = decode_table_row(
        enc.column(i("schema"))[0].as_py(),
        enc.column(i("meta"))[0].as_py(),
        enc.column(i("payload"))[0].as_py(),
    )
    _bit_equal(batch, out)
