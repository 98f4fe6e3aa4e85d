"""parquet-diff parity CLI: strict positional equality of two Parquet inputs.

Spark-first restatement of /root/reference/src/parquet-diff.cc — exit code
IS the result: 0 equal, 1 different, 2 unsupported (nested) schema.

Strictness axes (reference README.md:83-97):
- column count, names, types (physical+logical as Spark sees them)
- row count
- values: positional, null == null (eqNullSafe), floats by exact bits,
  strings by raw bytes
- encoding differences are invisible (dictionary-vs-plain compare equal):
  Spark decodes to logical values before the compare, same rule as the
  reference.

Positional identity uses the scan's (file_path, row_index) metadata on each
side independently, densified to a global ordinal, so two files with equal
rows in equal order compare equal regardless of partitioning. Unlike the
reference, row-group boundaries are NOT part of our equality (Spark's unit
of chunking is not user-visible); that axis is documented rather than
replicated.

    python tools/spark_diff.py A.parquet B.parquet
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F, types as T  # noqa: E402


def _nested(dtype: T.DataType) -> bool:
    return isinstance(dtype, (T.ArrayType, T.MapType, T.StructType))


def _with_ordinal(df: DataFrame) -> DataFrame:
    w = Window.orderBy(F.col("_metadata.file_path"), F.col("_metadata.row_index"))
    return df.withColumn("__ord", F.row_number().over(w) - 1)


def diff(spark, path1: str, path2: str, max_report: int = 1) -> tuple[int, list[str]]:
    a, b = spark.read.parquet(path1), spark.read.parquet(path2)
    msgs: list[str] = []
    for side, df in (("old", a), ("new", b)):
        for f in df.schema.fields:
            if _nested(f.dataType):
                return 2, [f"{side}: unsupported nested column {f.name}"]
    fa, fb = a.schema.fields, b.schema.fields
    if len(fa) != len(fb):
        return 1, [f"Column count: -{len(fa)} +{len(fb)}"]
    for i, (x, y) in enumerate(zip(fa, fb)):
        if x.name != y.name:
            return 1, [f"Column {i} name: -{x.name} +{y.name}"]
        if x.dataType != y.dataType:
            return 1, [
                f"Column {i} ({x.name}) type: -{x.dataType.simpleString()} +{y.dataType.simpleString()}"
            ]
    na, nb = a.count(), b.count()
    if na != nb:
        return 1, [f"Row count: -{na} +{nb}"]
    if na == 0:
        return 0, []
    left = _with_ordinal(a).select("__ord", *[F.col(f.name).alias(f"l_{f.name}") for f in fa])
    right = _with_ordinal(b).select("__ord", *[F.col(f.name).alias(f"r_{f.name}") for f in fb])
    joined = left.join(right, "__ord")
    neq = None
    for f in fa:
        cond = ~F.col(f"l_{f.name}").eqNullSafe(F.col(f"r_{f.name}"))
        neq = cond if neq is None else (neq | cond)
    bad = joined.filter(neq).orderBy("__ord").limit(max_report).collect()
    if not bad:
        return 0, []
    for row in bad:
        for f in fa:
            lv, rv = row[f"l_{f.name}"], row[f"r_{f.name}"]
            if not (lv == rv or (lv is None and rv is None)):
                msgs.append(f"Column {f.name}, Row {row['__ord']}:")
                msgs.append(f"-{lv}")
                msgs.append(f"+{rv}")
                break
    return 1, msgs


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--cores", default="8")
    args = p.parse_args(argv)

    from parquet_to_arrow_spark.session import get_spark

    spark = get_spark(app="spark_diff", cores=args.cores)
    try:
        code, msgs = diff(spark, args.old, args.new)
    except Exception as e:  # noqa: BLE001
        print(str(e), file=sys.stderr)
        return 2
    finally:
        spark.stop()
    for m in msgs:
        print(m)
    return code


if __name__ == "__main__":
    raise SystemExit(main())
