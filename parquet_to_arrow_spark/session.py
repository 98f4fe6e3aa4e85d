"""SparkSession factory tuned for the encode engine.

Local-mode defaults match the sandbox (local[$SPARK_GRAFT_CPUS], single JVM);
on a real cluster the same settings apply per executor. Arrow batch size is
the chunk-size knob: one Arrow batch == one encoded chunk on the fast path,
the Spark analogue of the reference's row group (SURVEY.md §1.4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# ~8k rows/chunk at ~128-1024 tokens/row => 4-32 MB of flat int32 per chunk:
# large enough to amortize codec setup, small enough to stay in executor RAM
# at 100 TB scale (chunks are independent; memory is O(chunk), not O(input)).
DEFAULT_CHUNK_ROWS = 8192


def get_spark(
    app: str = "parquet_to_arrow_spark",
    cores: int | str | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    ncores = os.cpu_count() if cores == "*" else int(cores)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(ncores, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.session.timeZone", "UTC")
        # int64 micros, not the deprecated INT96: INT96 chunks carry no
        # min/max statistics (killing manifest bounds / file skipping for
        # timestamp columns) and Iceberg's spec requires micros anyway
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(chunk_rows))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
