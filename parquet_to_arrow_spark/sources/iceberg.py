"""Iceberg table source/sink (gated: jars not present in this image).

The north rule targets Iceberg tables of pre-tokenized sequences. This image
has no iceberg-spark-runtime jar, so the connector is import-gated with the
exact production wiring documented; everything else in the engine is
storage-agnostic (encoded chunks + manifest are plain DataFrames).

Production config (public Iceberg docs):

    SparkSession.builder
      .config("spark.sql.extensions",
              "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
      .config("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
      .config("spark.sql.catalog.lake.type", "hadoop")   # or hive/rest
      .config("spark.sql.catalog.lake.warehouse", "s3://bucket/warehouse")

With the catalog present:
- scan:   spark.read.format("iceberg").load("lake.db.tokens") — or, for the
  Arrow-native fast path, feed the snapshot's data-file list (from the
  table's manifests) into sources/io.encode_parquet_dir.
- sink:   encoded.writeTo("lake.db.tokens_encoded").append() — atomic commit
  per encode run; the checkpoint table becomes an Iceberg table too and the
  mark_done append joins the same transaction boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Iceberg table if the runtime is present, else a parquet directory."""
    if iceberg_available(spark):
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def append(df: DataFrame, table_or_path: str) -> None:
    if iceberg_available(df.sparkSession):
        df.writeTo(table_or_path).append()
    else:
        df.write.mode("append").parquet(table_or_path)
