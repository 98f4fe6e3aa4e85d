"""Golden parity tests for the three reference-binary analogues.

Mirrors the reference's harness pattern (tests/util.py:57-77: build with
pyarrow -> write temp Parquet -> run tool -> byte-exact compare) and its
truth tables (tests/test_parquet_to_text_stream.py, tests/test_parquet_diff.py,
tests/test_parquet_to_arrow.py).
"""

from __future__ import annotations

import datetime as dt
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "tools")

from parquet_to_text import convert as to_text  # noqa: E402
from spark_diff import diff as spark_diff  # noqa: E402
from parquet_to_arrow import convert as to_arrow  # noqa: E402


def _write(tmp_path, table: pa.Table, name="t.parquet", **kw) -> str:
    path = str(tmp_path / name)
    pq.write_table(table, path, compression="snappy", version="2.6", **kw)
    return path


# --- parquet-to-text parity ---------------------------------------------------


def test_text_basic_int_string(spark, tmp_path):
    path = _write(tmp_path, pa.table({"A": [1, 2, 3], "B": ["a", None, "c"]}))
    assert to_text(spark, path, "csv") == "A,B\r\n1,a\r\n2,\r\n3,c"
    assert (
        to_text(spark, path, "json")
        == '[{"A":1,"B":"a"},{"A":2,"B":null},{"A":3,"B":"c"}]'
    )


def test_text_floats_nonfinite(spark, tmp_path):
    # reference test_convert_f32_f64 (:138-173)
    path = _write(
        tmp_path,
        pa.table(
            {
                "f64": pa.array(
                    [0.12314, 1e52, float("inf"), float("-inf"), float("nan"), None],
                    type=pa.float64(),
                )
            }
        ),
    )
    assert to_text(spark, path, "csv") == "f64\r\n0.12314\r\n1e+52\r\n\r\n\r\n\r\n"
    assert (
        to_text(spark, path, "json")
        == '[{"f64":0.12314},{"f64":1e+52},{"f64":null},{"f64":null},{"f64":null},{"f64":null}]'
    )


def test_text_escaping(spark, tmp_path):
    # reference test_convert_text (:176-194)
    path = _write(tmp_path, pa.table({"A": ["a,b", 'say "hi"', "line\nbreak", ""]}))
    assert (
        to_text(spark, path, "csv")
        == 'A\r\n"a,b"\r\n"say ""hi"""\r\n"line\nbreak"\r\n'
    )
    assert (
        to_text(spark, path, "json")
        == '[{"A":"a,b"},{"A":"say \\"hi\\""},{"A":"line\\nbreak"},{"A":""}]'
    )


def test_text_timestamps_shortest_iso(spark, tmp_path):
    # reference test_convert_datetime_us (:394-401)
    vals = [
        dt.datetime(2019, 3, 4),
        dt.datetime(2019, 3, 4, 5),
        dt.datetime(2019, 3, 4, 5, 6),
        dt.datetime(2019, 3, 4, 5, 6, 7),
        dt.datetime(2019, 3, 4, 5, 6, 7, 8000),
        dt.datetime(1960, 3, 4, 5, 6, 7, 8),
    ]
    path = _write(tmp_path, pa.table({"us": pa.array(vals, type=pa.timestamp("us"))}))
    assert to_text(spark, path, "csv") == (
        "us\r\n2019-03-04T00Z\r\n2019-03-04T05Z\r\n2019-03-04T05:06Z\r\n"
        "2019-03-04T05:06:07Z\r\n2019-03-04T05:06:07.008Z\r\n1960-03-04T05:06:07.000008Z"
    )
    # pyarrow's default timestamp is isAdjustedToUTC=false -> Spark reads
    # TimestampNTZ; JSON must still quote the ISO token (reference renders
    # timestamps as quoted JSON strings)
    out = to_text(spark, path, "json")
    import json as _json

    assert _json.loads(out) == [
        {"us": "2019-03-04T00Z"},
        {"us": "2019-03-04T05Z"},
        {"us": "2019-03-04T05:06Z"},
        {"us": "2019-03-04T05:06:07Z"},
        {"us": "2019-03-04T05:06:07.008Z"},
        {"us": "1960-03-04T05:06:07.000008Z"},
    ]


def test_text_timestamps_ms(spark, tmp_path):
    # reference test_convert_datetime_ms (:345-372)
    vals = [
        dt.datetime(2019, 3, 4),
        dt.datetime(2019, 3, 4, 5),
        dt.datetime(2019, 3, 4, 5, 6),
        dt.datetime(2019, 3, 4, 5, 6, 7),
        dt.datetime(1960, 3, 4, 0, 0, 0, 8000),
        None,
        None,
    ]
    path = _write(tmp_path, pa.table({"ms": pa.array(vals, type=pa.timestamp("ms"))}))
    assert to_text(spark, path, "csv") == (
        "ms\r\n2019-03-04T00Z\r\n2019-03-04T05Z\r\n2019-03-04T05:06Z\r\n"
        "2019-03-04T05:06:07Z\r\n1960-03-04T00:00:00.008Z\r\n\r\n"
    )
    assert to_text(spark, path, "json") == (
        '[{"ms":"2019-03-04T00Z"},{"ms":"2019-03-04T05Z"},{"ms":"2019-03-04T05:06Z"},'
        '{"ms":"2019-03-04T05:06:07Z"},{"ms":"1960-03-04T00:00:00.008Z"},'
        '{"ms":null},{"ms":null}]'
    )


def test_text_timestamps_ns(spark, tmp_path):
    # reference test_convert_datetime_ns (:404-435): 9-digit fraction case
    import pandas as pd

    vals = [
        pd.Timestamp(2019, 3, 4).value,
        pd.Timestamp(2019, 3, 4, 5).value,
        pd.Timestamp(2019, 3, 4, 5, 6).value,
        pd.Timestamp(2019, 3, 4, 5, 6, 7).value,
        pd.Timestamp(2019, 3, 4, 5, 6, 7, 8000).value,
        pd.Timestamp(2019, 3, 4, 5, 6, 7, 8).value,
        pd.Timestamp(1960, 3, 4, 5, 6, 7).value + 8,  # negative epoch + 8 ns
    ]
    path = _write(tmp_path, pa.table({"ns": pa.array(vals, type=pa.timestamp("ns"))}))
    assert to_text(spark, path, "csv") == (
        "ns\r\n2019-03-04T00Z\r\n2019-03-04T05Z\r\n2019-03-04T05:06Z\r\n"
        "2019-03-04T05:06:07Z\r\n2019-03-04T05:06:07.008Z\r\n"
        "2019-03-04T05:06:07.000008Z\r\n1960-03-04T05:06:07.000000008Z"
    )
    assert to_text(spark, path, "json") == (
        '[{"ns":"2019-03-04T00Z"},{"ns":"2019-03-04T05Z"},{"ns":"2019-03-04T05:06Z"},'
        '{"ns":"2019-03-04T05:06:07Z"},{"ns":"2019-03-04T05:06:07.008Z"},'
        '{"ns":"2019-03-04T05:06:07.000008Z"},{"ns":"1960-03-04T05:06:07.000000008Z"}]'
    )


def test_text_uint64(spark, tmp_path):
    # reference test_convert_uint64 (:104-115): signed physical storage
    # reinterpreted as unsigned at print time; 9223372039002259456 > 2^63
    path = _write(
        tmp_path,
        pa.table(
            {"u64": pa.array([1, 9223372039002259456, None], type=pa.uint64())}
        ),
    )
    assert to_text(spark, path, "csv") == "u64\r\n1\r\n9223372039002259456\r\n"
    assert (
        to_text(spark, path, "json")
        == '[{"u64":1},{"u64":9223372039002259456},{"u64":null}]'
    )


def test_text_uint8_uint16_uint32(spark, tmp_path):
    # reference test_convert_uint8_uint16_uint32 (:118-135)
    path = _write(
        tmp_path,
        pa.table(
            {
                "u8": pa.array([1, 138, None], type=pa.uint8()),
                "u16": pa.array([1, 38383, None], type=pa.uint16()),
                "u32": pa.array([1, 4294967291, None], type=pa.uint32()),
            }
        ),
    )
    assert to_text(spark, path, "csv") == "u8,u16,u32\r\n1,1,1\r\n138,38383,4294967291\r\n,,"
    assert to_text(spark, path, "json") == (
        '[{"u8":1,"u16":1,"u32":1},{"u8":138,"u16":38383,"u32":4294967291},'
        '{"u8":null,"u16":null,"u32":null}]'
    )


def test_text_row_and_column_range_with_clipping(spark, tmp_path):
    # reference :281-338
    table = pa.table({c: [f"{c}{i}" for i in range(5)] for c in "ABCDE"})
    path = _write(tmp_path, table)
    assert (
        to_text(spark, path, "csv", column_range=(1, 3))
        == "B,C\r\nB0,C0\r\nB1,C1\r\nB2,C2\r\nB3,C3\r\nB4,C4"
    )
    assert to_text(spark, path, "csv", row_range=(2, 4)) == (
        "A,B,C,D,E\r\nA2,B2,C2,D2,E2\r\nA3,B3,C3,D3,E3"
    )
    # ranges past the table clip (reference Range.clip)
    assert to_text(spark, path, "csv", row_range=(4, 99), column_range=(3, 99)) == (
        "D,E\r\nD4,E4"
    )


# --- parquet-diff parity --------------------------------------------------------


def test_diff_truth_table(spark, tmp_path):
    base = pa.table({"A": [1, 2, 3], "B": ["x", None, "z"]})
    p1 = _write(tmp_path, base, "a.parquet")

    # identical content, separately written file -> equal
    p2 = _write(tmp_path, pa.table({"A": [1, 2, 3], "B": ["x", None, "z"]}), "b.parquet")
    assert spark_diff(spark, p1, p2)[0] == 0

    # value difference -> 1, first-diff report
    p3 = _write(tmp_path, pa.table({"A": [1, 2, 3], "B": ["x", "y", "z"]}), "c.parquet")
    code, msgs = spark_diff(spark, p1, p3)
    assert code == 1
    assert msgs[0].startswith("Column B, Row 1")
    assert msgs[1] == "-None" and msgs[2] == "+y"

    # column name difference -> 1
    p4 = _write(tmp_path, pa.table({"A": [1, 2, 3], "C": ["x", None, "z"]}), "d.parquet")
    assert spark_diff(spark, p1, p4)[0] == 1

    # physical type difference (int32 vs int64, reference :33-39) -> 1
    p5 = _write(
        tmp_path,
        pa.table({"A": pa.array([1, 2, 3], type=pa.int32()), "B": ["x", None, "z"]}),
        "e.parquet",
    )
    assert spark_diff(spark, p1, p5)[0] == 1

    # row count difference -> 1
    p6 = _write(tmp_path, pa.table({"A": [1, 2], "B": ["x", None]}), "f.parquet")
    assert spark_diff(spark, p1, p6)[0] == 1

    # dictionary-encoded vs plain but equal values -> equal (reference :210-214)
    p7 = _write(
        tmp_path,
        pa.table({"A": [1, 2, 3], "B": ["x", None, "z"]}),
        "g.parquet",
        use_dictionary=True,
    )
    p8 = _write(
        tmp_path,
        pa.table({"A": [1, 2, 3], "B": ["x", None, "z"]}),
        "h.parquet",
        use_dictionary=False,
    )
    assert spark_diff(spark, p7, p8)[0] == 0

    # nested -> 2 (reference exit 2, :53-61)
    p9 = _write(tmp_path, pa.table({"A": [[1, 2], [3]]}), "i.parquet")
    assert spark_diff(spark, p9, p9)[0] == 2


def test_diff_logical_type_axes(spark, tmp_path):
    """Reference: timestamp unit and isAdjustedToUTC mismatches are SCHEMA
    diffs (src/parquet-diff.cc:24-64, tests/test_parquet_diff.py:308-338)
    even though Spark's reader normalizes both to us-precision — the footer
    probe preserves the axis. Parquet v1 vs v2 files with equal data stay
    equal (reference :341-355)."""
    vals = [dt.datetime(2019, 3, 4, 5, 6, 7)]
    us = _write(tmp_path, pa.table({"ts": pa.array(vals, type=pa.timestamp("us"))}), "us.parquet")
    ms = _write(tmp_path, pa.table({"ts": pa.array(vals, type=pa.timestamp("ms"))}), "ms.parquet")
    tz = _write(
        tmp_path,
        pa.table({"ts": pa.array(vals, type=pa.timestamp("us", tz="UTC"))}),
        "tz.parquet",
    )
    code, msgs = spark_diff(spark, us, ms)
    assert code == 1 and "logical type" in msgs[0], msgs
    assert spark_diff(spark, us, tz)[0] == 1
    assert spark_diff(spark, us, us)[0] == 0

    # parquet format v1 vs v2, same data -> equal
    data = pa.table({"A": [1, 2, 3]})
    v1 = str(tmp_path / "v1.parquet")
    pq.write_table(data, v1, compression="snappy", version="1.0")
    v2 = _write(tmp_path, data, "v2.parquet")
    assert spark_diff(spark, v1, v2)[0] == 0


def test_diff_strict_chunking(spark, tmp_path):
    """Reference: files with different row-group boundaries are different by
    definition (src/parquet-diff.cc:238-245, README.md:81-82) — opt-in here."""
    data = pa.table({"A": list(range(10))})
    one_group = _write(tmp_path, data, "one.parquet")
    path = str(tmp_path / "many.parquet")
    pq.write_table(data, path, compression="snappy", version="2.6", row_group_size=4)

    # same data, different chunking: default compare equal...
    assert spark_diff(spark, one_group, path)[0] == 0
    # ...strict chunking -> different, both directions
    code, msgs = spark_diff(spark, one_group, path, strict_chunking=True)
    assert code == 1 and msgs[0] == "RowGroup count: -1 +3"
    assert spark_diff(spark, path, one_group, strict_chunking=True)[0] == 1
    # identical chunking passes strict mode
    assert spark_diff(spark, path, path, strict_chunking=True)[0] == 0


def test_diff_ordinal_plan_has_no_global_window(spark, tmp_path):
    """The positional join must never funnel the table through one task:
    no Window, no single-partition Exchange; the offsets join broadcasts."""
    from spark_diff import _with_ordinal

    path = _write(tmp_path, pa.table({"A": list(range(100))}), "plan.parquet")
    df = _with_ordinal(spark.read.parquet(path))
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = jdf.queryExecution().explainString(mode)
    assert "Window" not in plan, plan
    assert "SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def test_text_float32_and_dictionary_column(spark, tmp_path):
    # reference convert_f32 (:138, ToShortestSingle) + convert_text_dictionaries (:197)
    t = pa.table(
        {
            "f32": pa.array([0.1, None], type=pa.float32()),
            "s": pa.array(["x", "x"]).dictionary_encode(),
        }
    )
    path = _write(tmp_path, t, "f32dict.parquet")
    assert to_text(spark, path, "csv") == "f32,s\r\n0.1,x\r\n,x"
    assert to_text(spark, path, "json") == '[{"f32":0.1,"s":"x"},{"f32":null,"s":"x"}]'


def test_to_arrow_categorical_edge_cases(spark, tmp_path):
    """Reference: NA-only and EMPTY categorical columns keep their dictionary
    type through conversion (tests/test_parquet_to_arrow.py:105-127 — these
    exist because of a production Arrow bug)."""
    cat = pa.dictionary(pa.int32(), pa.string())
    for name, vals in (("na_cat", [None, None]), ("empty_cat", [])):
        path = _write(tmp_path, pa.table({"A": pa.array(vals, type=cat)}), f"{name}.parquet")
        out = str(tmp_path / f"{name}.arrow")
        to_arrow(spark, path, out)
        with pa.ipc.open_file(out) as reader:
            got = reader.read_all()
        assert pa.types.is_dictionary(got.schema.field("A").type), name
        assert got.column("A").to_pylist() == vals, name


def test_to_arrow_timestamp_date_allnull(spark, tmp_path):
    # reference read_write_timestamp/date/all-null (:50-63, :95-102)
    t = pa.table(
        {
            "ts": pa.array([dt.datetime(2019, 3, 4, 5, 6, 7, 8), None], type=pa.timestamp("us")),
            "d": pa.array([dt.date(1960, 3, 4), None], type=pa.date32()),
            "nul": pa.array([None, None], type=pa.float64()),
        }
    )
    path = _write(tmp_path, t, "tsd.parquet")
    out = str(tmp_path / "tsd.arrow")
    to_arrow(spark, path, out)
    with pa.ipc.open_file(out) as reader:
        got = reader.read_all()
    assert got.column("ts").to_pylist() == [dt.datetime(2019, 3, 4, 5, 6, 7, 8), None]
    assert got.column("d").to_pylist() == [dt.date(1960, 3, 4), None]
    assert got.column("nul").to_pylist() == [None, None]


# --- wire-format edge fixtures ----------------------------------------------------
# Binary parquet files from the reference test suite (tests/files/ —
# fastparquet-written; fastparquet is not available in this image to
# regenerate them). They exist because of real production bugs: a
# dictionary file whose column chunk doesn't advertise a *_DICTIONARY
# encoding, and a file with ZERO row groups (pyarrow cannot even write one).

FIXTURES = os.path.join(os.path.dirname(__file__), "files")


def test_fixture_fastparquet_dictionary(spark, tmp_path):
    # reference tests/test_parquet_to_arrow.py:73-92
    path = os.path.join(FIXTURES, "column-A-dictionary-from-fastparquet.parquet")
    assert to_text(spark, path, "csv") == "A\r\nx\r\n\r\ny\r\nx\r\nx"
    assert (
        to_text(spark, path, "json")
        == '[{"A":"x"},{"A":null},{"A":"y"},{"A":"x"},{"A":"x"}]'
    )
    out = str(tmp_path / "fp.arrow")
    to_arrow(spark, path, out)
    with pa.ipc.open_file(out) as reader:
        got = reader.read_all()
    # dictionary-ness preserved (the file HAS a dictionary page even though
    # no *_DICTIONARY data-page encoding is listed) and values intact
    assert pa.types.is_dictionary(got.schema.field("A").type)
    assert got.column("A").to_pylist() == ["x", None, "y", "x", "x"]


def test_fixture_zero_row_groups(spark, tmp_path):
    # reference tests/test_parquet_to_arrow.py:130-177 and
    # test_parquet_to_text_stream.py:259-278: schema honored, zero rows
    path = os.path.join(FIXTURES, "column-A-string-with-no-row-groups.parquet")
    assert to_text(spark, path, "csv") == "A"
    assert to_text(spark, path, "json") == "[]"
    out = str(tmp_path / "zero.arrow")
    to_arrow(spark, path, out)
    with pa.ipc.open_file(out) as reader:
        got = reader.read_all()
    assert got.num_rows == 0
    assert got.schema.field("A").type == pa.string()


# --- parquet-to-arrow parity -----------------------------------------------------


def test_to_arrow_roundtrip_and_dictionary_preservation(spark, tmp_path):
    table = pa.table(
        {
            "num": pa.array([1, 2**62, 3], type=pa.int64()),
            "txt": pa.array(["x", "x", "y"]),
            "f": pa.array([1.0, 2.2, float("nan")], type=pa.float64()),
        }
    )
    src = _write(tmp_path, table, "src.parquet", use_dictionary=["txt"])
    out = str(tmp_path / "out.arrow")
    to_arrow(spark, src, out)
    with pa.ipc.open_file(out) as reader:
        got = reader.read_all()
    assert got.schema.metadata is None or len(got.schema.metadata) == 0
    assert pa.types.is_dictionary(got.schema.field("txt").type)
    assert got.column("txt").to_pylist() == ["x", "x", "y"]
    assert got.column("num").to_pylist() == [1, 2**62, 3]
    f = got.column("f").to_pylist()
    assert f[0] == 1.0 and f[1] == 2.2 and np.isnan(f[2])


def test_text_unsigned_and_narrow_ints(spark, tmp_path):
    # reference test_convert_int_types (:84-135) incl. u64 > i64max
    table = pa.table(
        {
            "i8": pa.array([-128, 127, None], type=pa.int8()),
            "u32": pa.array([0, 4294967295, None], type=pa.uint32()),
            "u64": pa.array([0, 9223372039002259456, None], type=pa.uint64()),
        }
    )
    path = _write(tmp_path, table)
    assert to_text(spark, path, "csv") == (
        "i8,u32,u64\r\n-128,0,0\r\n127,4294967295,9223372039002259456\r\n,,"
    )


def test_text_date32_pre_epoch(spark, tmp_path):
    # reference test_convert_date32 (:438-450)
    path = _write(
        tmp_path,
        pa.table({"d": pa.array([18689, None, -123], type=pa.date32())}),
    )
    assert to_text(spark, path, "csv") == "d\r\n2021-03-03\r\n\r\n1969-08-31"
    assert (
        to_text(spark, path, "json")
        == '[{"d":"2021-03-03"},{"d":null},{"d":"1969-08-31"}]'
    )


def test_text_zero_rows(spark, tmp_path):
    # reference zero-row tests (:259-278)
    path = _write(tmp_path, pa.table({"A": pa.array([], type=pa.string())}))
    assert to_text(spark, path, "csv") == "A"
    assert to_text(spark, path, "json") == "[]"


def test_arrow_ipc_source_round_trip(spark, tmp_path):
    """parquet -> (our parquet-to-arrow) -> .arrow -> read_arrow_ipc: the
    toolchain's output is a first-class engine input again."""
    from parquet_to_arrow_spark.sources.io import read_arrow_ipc

    table = pa.table(
        {
            "num": pa.array([1, 2**62, None], type=pa.int64()),
            "txt": pa.array(["x", None, "Ω"]),
        }
    )
    src = _write(tmp_path, table, "rt.parquet")
    out = str(tmp_path / "rt.arrow")
    to_arrow(spark, src, out)
    df = read_arrow_ipc(spark, out, "num long, txt string")
    got = sorted(df.collect(), key=lambda r: (r["num"] is None, r["num"] or 0))
    assert [(r["num"], r["txt"]) for r in got] == [
        (1, "x"), (2**62, None), (None, "Ω")
    ]
