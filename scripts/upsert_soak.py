"""Kill-and-resume soak for the streaming CDC upsert sink.

Drives streaming_upsert_to_iceberg over a synthetic CDC feed, is meant to
be SIGKILLed mid-stream by the operator (kill the whole process group),
then re-run to drain, then verified:

    python scripts/upsert_soak.py synth  <work>   # landing dir: 512 CDC files
    python scripts/upsert_soak.py run    <work>   # drain (kill this one)
    python scripts/upsert_soak.py run    <work>   # resume: finishes the feed
    python scripts/upsert_soak.py verify <work>   # exact latest-row check

The feed is 512 files x 25k rows over a 400k key space (8 micro-batches at the sink's maxFilesPerTrigger=64); each file carries
version v = its file index and text = f"{key}:{v}", so the expected final
table is EXACTLY max-v-per-key regardless of how files group into
micro-batches — verifiable without replaying the batch order. verify also
checks batch-id uniqueness (no epoch double-applied across the kill),
folds the accumulated equality deletes with materialize_deletes, and
re-checks the folded table byte-for-byte.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_arrow_spark.session import get_spark

N_FILES = 512
ROWS_PER_FILE = 25_000
KEYSPACE = 400_000
DDL = "doc_id bigint, text string, v int"


def synth(work: str) -> None:
    spark = get_spark(app="upsert_soak_synth")
    land = os.path.join(work, "cdc")
    for i in range(N_FILES):
        # keys of file i: a deterministic stride so every file hits a
        # different-but-overlapping slice of the key space
        df = spark.range(ROWS_PER_FILE).select(
            ((F.col("id") * 17 + F.lit(i * 31)) % KEYSPACE).alias("doc_id"),
            F.lit(i).alias("v"),
        ).dropDuplicates(["doc_id"]).select(
            "doc_id",
            F.concat_ws(":", F.col("doc_id").cast("string"), F.lit(str(i))).alias(
                "text"
            ),
            "v",
        )
        df.coalesce(1).write.mode("append").parquet(land)
    print(json.dumps({"synth_files": N_FILES, "rows_per_file": ROWS_PER_FILE}))
    spark.stop()


def run(work: str) -> None:
    from parquet_to_arrow_spark.streaming.incremental import streaming_upsert_to_iceberg

    spark = get_spark(app="upsert_soak_run")
    q = streaming_upsert_to_iceberg(
        spark,
        os.path.join(work, "cdc"),
        os.path.join(work, "table"),
        os.path.join(work, "ck"),
        ["doc_id"],
        DDL,
    )
    q.awaitTermination()
    print(json.dumps({"drained": True}))
    spark.stop()


def verify(work: str) -> None:
    from parquet_to_arrow_spark.sources import iceberg, iceberg_meta

    spark = get_spark(app="upsert_soak_verify")
    table = os.path.join(work, "table")
    feed = spark.read.schema(DDL).parquet(os.path.join(work, "cdc"))
    expected = (
        feed.groupBy("doc_id")
        .agg(F.max(F.struct("v", "text")).alias("r"))
        .select("doc_id", F.col("r.text").alias("text"), F.col("r.v").alias("v"))
    )
    got = iceberg.read_table(spark, table)
    n_exp = expected.count()
    n_bad = expected.exceptAll(got).unionAll(got.exceptAll(expected)).count()
    batches = [
        int(s["summary"]["batch"])
        for s in iceberg_meta.snapshots(table)
        if "batch" in s.get("summary", {})
    ]
    report = {
        "expected_keys": n_exp,
        "table_rows": got.count(),
        "diff_rows": n_bad,
        "snapshots": len(iceberg_meta.snapshots(table)),
        "batch_ids_unique": len(batches) == len(set(batches)),
        "pending_delete_files": len(iceberg_meta.snapshot_delete_files(table)),
    }
    assert n_bad == 0 and report["batch_ids_unique"], report
    # fold the MoR debt and re-check byte-identical content
    iceberg.materialize_deletes(spark, table)
    report["post_materialize_deletes"] = len(iceberg_meta.snapshot_delete_files(table))
    after = iceberg.read_table(spark, table)
    n_bad2 = expected.exceptAll(after).unionAll(after.exceptAll(expected)).count()
    report["diff_rows_after_materialize"] = n_bad2
    assert n_bad2 == 0 and report["post_materialize_deletes"] == 0, report
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    {"synth": synth, "run": run, "verify": verify}[sys.argv[1]](sys.argv[2])
