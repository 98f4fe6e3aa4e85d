"""Golden render tests mirroring the reference's text-stream expectations
(/root/reference/tests/test_parquet_to_text_stream.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pyspark.sql import Row, functions as F

from parquet_to_arrow_spark.functions.render import (
    csv_field,
    csv_lines,
    ecma_format_float,
    ecma_format_float32,
    iso8601_shortest,
    json_objects,
)


# reference test_convert_f32_f64 (:138-173) + double-conversion semantics
ECMA_F64 = [
    (0.12314, "0.12314"),
    (9999999999999999999999999999999999999999999999999999.0, "1e+52"),
    (1.0, "1"),
    (-1.5, "-1.5"),
    (0.0, "0"),
    (1e21, "1e+21"),
    (1e20, "100000000000000000000"),
    (0.000001, "0.000001"),
    (1.5e-7, "1.5e-7"),
    (-1e-7, "-1e-7"),
    (1024.5, "1024.5"),
]


@pytest.mark.parametrize("value,expect", ECMA_F64)
def test_ecma_float64(value, expect):
    assert ecma_format_float(value) == expect


def test_ecma_float32_shortest_single():
    # 0.12314 stored as float32 widens to 0.12313999...; shortest single wins
    assert ecma_format_float32(float("%r" % 0.12313999980688095)) == "0.12314"
    assert ecma_format_float32(9999999999999999999.0) == "10000000000000000000"


def test_ecma_nonfinite_none():
    for f in (ecma_format_float, ecma_format_float32):
        assert f(float("nan")) is None
        assert f(float("inf")) is None
        assert f(float("-inf")) is None


def test_ecma_vectorized_matches_spec():
    """The Arrow-cast fast path (_ecma_series) must agree with the
    per-element spec formatter on adversarial magnitudes, band boundaries,
    subnormals and signed zero."""
    import numpy as np
    import pandas as pd

    from parquet_to_arrow_spark.functions.render import _ecma_series

    rng = np.random.default_rng(7)
    vals = np.concatenate(
        [
            rng.normal(0, 1, 20000),
            rng.normal(0, 1, 20000) * 10.0 ** rng.integers(-320, 308, 20000),
            rng.integers(-(10**18), 10**18, 10000).astype(np.float64),
            np.array(
                [0.0, -0.0, 1e-6, 9.999e-7, 1e21, 9.99e20, 1e16, 1e15,
                 1234567890123456.7, 5e-324, -5e-324, 1.7976931348623157e308,
                 float("nan"), float("inf"), float("-inf")]
            ),
        ]
    )
    got = _ecma_series(pd.Series(vals))
    want = pd.Series(vals).map(ecma_format_float, na_action="ignore")
    for v, w, g in zip(vals, want, got):
        if w is None or (isinstance(w, float) and w != w):
            assert g is None or g != g, f"{v!r}: expected null, got {g!r}"
        else:
            assert g == w, f"{v!r}: {g!r} != {w!r}"


# reference test_convert_datetime_us (:394-401): shortest ISO-8601
ISO_CASES = [
    (datetime(2019, 3, 4), "2019-03-04T00Z"),
    (datetime(2019, 3, 4, 5), "2019-03-04T05Z"),
    (datetime(2019, 3, 4, 5, 6), "2019-03-04T05:06Z"),
    (datetime(2019, 3, 4, 5, 6, 7), "2019-03-04T05:06:07Z"),
    (datetime(2019, 3, 4, 5, 6, 7, 8000), "2019-03-04T05:06:07.008Z"),
    (datetime(1960, 3, 4, 5, 6, 7, 8), "1960-03-04T05:06:07.000008Z"),
]


def test_iso8601_shortest(spark):
    df = spark.createDataFrame([Row(i=i, ts=ts) for i, (ts, _) in enumerate(ISO_CASES)])
    got = {
        r["i"]: r["s"]
        for r in df.select("i", iso8601_shortest(F.col("ts")).alias("s")).collect()
    }
    for i, (_, expect) in enumerate(ISO_CASES):
        assert got[i] == expect, f"case {i}: {got[i]} != {expect}"


# reference test_convert_text (:176-194): CSV quoting hazards
def test_csv_quoting(spark):
    rows = [
        Row(i=0, v="plain"),
        Row(i=1, v="a,b"),
        Row(i=2, v='say "hi"'),
        Row(i=3, v="line\nbreak"),
        Row(i=4, v=""),
        Row(i=5, v=None),
    ]
    df = spark.createDataFrame(rows)
    got = {r["i"]: r["f"] for r in df.select("i", csv_field(F.col("v")).alias("f")).collect()}
    assert got[0] == "plain"
    assert got[1] == '"a,b"'
    assert got[2] == '"say ""hi"""'
    assert got[3] == '"line\nbreak"'
    assert got[4] == ""
    assert got[5] == ""


def test_csv_lines_and_json_objects(spark):
    df = spark.createDataFrame([Row(a=1, b="x,y"), Row(a=2, b=None)])
    lines = [r["line"] for r in csv_lines(df, ["a", "b"]).collect()]
    assert lines == ['1,"x,y"', "2,"]
    objs = [r["obj"] for r in json_objects(df, ["a", "b"]).collect()]
    assert objs == ['{"a":1,"b":"x,y"}', '{"a":2,"b":null}']
