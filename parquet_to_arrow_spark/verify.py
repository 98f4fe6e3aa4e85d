"""Round-trip verification: the ``parquet-diff`` role, Spark-first.

The reference zip-compares two files positionally with null-safe typed
equality and reports the first mismatch (reference: src/parquet-diff.cc:
67-81 schema, 167-211 values, 264-289 drive loop). Positional compare does
not distribute, so the Spark restatement keys rows by ``doc_id`` (stable row
identity) and compares payloads with ``eqNullSafe`` — null == null, exactly
the reference's rule (src/parquet-diff.cc:197-207). Encoding differences are
invisible by design: equality is on *decoded logical values*
(reference README.md:93-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_COLUMNS = ("tokens", "n_tok", "source")


def diff_report(
    original: DataFrame,
    decoded: DataFrame,
    key: str = "doc_id",
    columns: tuple[str, ...] = TOKEN_COLUMNS,
) -> dict:
    """Full outer join on the key; count missing/extra/mismatching rows.

    Returns {'equal': bool, 'n_left': int, 'n_right': int, 'ok', 'missing',
    'extra', 'mismatch'} plus, when unequal, 'sample': up to 5 diff rows —
    the distributed analogue of the reference's "RowGroup i, Column j,
    Row k" first-difference report. Row counts are compared explicitly:
    a side with duplicated keys joins every duplicate as 'ok', so without
    the count check a duplicated-row corruption would be silent (reference
    parquet-diff fails on row-count mismatch, src/parquet-diff.cc:238-245).
    """
    if original.schema != decoded.schema:
        # schema difference short-circuits, like parquet-diff exit 1 on
        # column name/type mismatch (src/parquet-diff.cc:24-64)
        return {
            "equal": False,
            "reason": "schema",
            "left_schema": original.schema.simpleString(),
            "right_schema": decoded.schema.simpleString(),
        }
    left = original.select(key, *columns).alias("l")
    right = decoded.select(key, *columns).alias("r")
    n_left, n_right = left.count(), right.count()
    joined = left.join(right, on=F.col(f"l.{key}") == F.col(f"r.{key}"), how="full_outer")
    match_expr = F.lit(True)
    for c in columns:
        match_expr = match_expr & F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
    status = (
        F.when(F.col(f"l.{key}").isNull(), "extra")
        .when(F.col(f"r.{key}").isNull(), "missing")
        .when(~match_expr, "mismatch")
        .otherwise("ok")
    )
    counts = {
        r["status"]: r["n"]
        for r in joined.select(status.alias("status")).groupBy("status").count()
        .withColumnRenamed("count", "n").collect()
    }
    bad = {k: counts.get(k, 0) for k in ("missing", "extra", "mismatch")}
    report = {
        "equal": not any(bad.values()) and n_left == n_right,
        "n_left": n_left,
        "n_right": n_right,
        "ok": counts.get("ok", 0),
        **bad,
    }
    if not report["equal"]:
        sample = (
            joined.withColumn("status", status)
            .filter(F.col("status") != "ok")
            .select("status", f"l.{key}", *[f"l.{c}" for c in columns], *[f"r.{c}" for c in columns])
            .limit(5)
            .collect()
        )
        report["sample"] = [row.asDict() for row in sample]
    return report


def assert_roundtrip(original: DataFrame, decoded: DataFrame, **kw) -> dict:
    report = diff_report(original, decoded, **kw)
    assert report["equal"], f"round-trip mismatch: {report}"
    return report
