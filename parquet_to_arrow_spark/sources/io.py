"""Arrow-native distributed parquet scan: the engine's fast data path.

Spark's row<->Arrow bridge converts array columns element-at-a-time (boxing),
which caps list<int32> throughput far below kernel speed. A 100 TB encode
job therefore distributes FILE SPLITS, not rows: tasks receive parquet file
paths and scan them directly with pyarrow (zero-copy to the codec kernels),
exactly like the reference opens the Parquet footer itself
(reference: src/parquet-to-arrow.cc:19). Only the encoded chunk rows —
compact binary blobs — cross the JVM boundary.

On a real cluster the same pattern works against HDFS/S3 via pyarrow.fs;
here paths are local. Iceberg integration would hand us these file lists
from a snapshot's manifests (jars not in this image — see checkpoint.py).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..encode import ENCODED_SCHEMA_DDL, encode_batch
from ..session import DEFAULT_CHUNK_ROWS


def resolve_files(path: str, suffix: str = ".parquet"):
    """(pyarrow FileSystem, sorted FileInfos) for a file or directory on ANY
    Hadoop-compatible filesystem — local paths, hdfs://, s3://. Footer
    probes and listings must not assume local disk (checkpoint.py switched
    to FS-agnostic probing in round 2 for the same reason); plain paths
    resolve on the local FS."""
    from pyarrow import fs as pafs

    p = path if "://" in path else os.path.abspath(path)
    filesystem, root = pafs.FileSystem.from_uri(p)
    info = filesystem.get_file_info(root)
    if info.type == pafs.FileType.Directory:
        infos = sorted(
            (
                i
                for i in filesystem.get_file_info(pafs.FileSelector(root))
                if i.type == pafs.FileType.File and i.path.endswith(suffix)
            ),
            key=lambda i: i.path,
        )
    else:
        infos = [info] if info.type == pafs.FileType.File else []
    return filesystem, infos


def footer_file(path: str, suffix: str = ".parquet") -> pq.ParquetFile:
    """ParquetFile over the first file at ``path``: the single-footer probe
    (schema / logical types / first batch), FS-agnostic."""
    filesystem, infos = resolve_files(path, suffix)
    if not infos:
        raise FileNotFoundError(path)
    return pq.ParquetFile(filesystem.open_input_file(infos[0].path))


def qualify_path(p: str, original: str) -> str:
    """Reattach the scheme (and authority, for path-style filesystems like
    HDFS) that pyarrow's FileSystem.from_uri strips from FileInfo.path.
    Without this, a FileInfo path like 'bucket/key' (from s3://bucket/key)
    shipped to an executor looks LOCAL to open_parquet's '://' test and is
    opened against the worker's local disk — the remote branch was
    unreachable. Local paths pass through untouched."""
    if "://" not in original:
        return p
    scheme, rest = original.split("://", 1)
    if p.startswith("/"):  # path-style URI (hdfs://host:port/...): keep authority
        return f"{scheme}://{rest.split('/', 1)[0]}{p}"
    return f"{scheme}://{p}"  # bucket-style (s3://bucket/key)


def open_parquet(fpath: str) -> pq.ParquetFile:
    """Executor-side open: re-derives the filesystem from the path's scheme
    per task (filesystem handles don't serialize), local fast path for plain
    paths."""
    if "://" not in fpath:
        return pq.ParquetFile(fpath)
    from pyarrow import fs as pafs

    filesystem, p = pafs.FileSystem.from_uri(fpath)
    return pq.ParquetFile(filesystem.open_input_file(p))


def list_parquet_files(path: str) -> list[str]:
    """Scheme-qualified file paths — safe to ship to executors or hand to
    pyarrow's URI-inferring openers."""
    return [qualify_path(i.path, path) for i in resolve_files(path)[1]]


TARGET_TASK_BYTES = 256 << 20


def files_df(
    spark: SparkSession,
    path: str | None,
    target_bytes: int = TARGET_TASK_BYTES,
    files: list[str] | None = None,
    sizes: dict[str, int] | None = None,
) -> DataFrame:
    """One row per parquet file, grouped into size-balanced task partitions.

    Task granularity is BYTES, not files: each Spark→Python task round-trip
    costs ~0.2 s of fixed overhead (measured on a no-op mapInArrow at
    local[1]), so one-task-per-small-file wastes most of the wall clock on a
    many-file input — the same reason Spark's own scans pack small files up
    to maxPartitionBytes. Groups are built greedily largest-file-first into
    min(n_files, max(parallelism, total/target)) bins (rounded up to a
    multiple of the parallelism so waves stay balanced), then laid out one
    group per partition via exact slicing — no shuffle, no hash skew.

    Pass an explicit ``files``+``sizes`` pair (e.g. from an Iceberg
    manifest walk, which already knows both) to skip the filesystem
    listing entirely."""
    import math

    if files is None:
        _, infos = resolve_files(path)
        files = [qualify_path(i.path, path) for i in infos]
        sizes = {qualify_path(i.path, path): i.size for i in infos}
    if not files:
        return spark.createDataFrame([], "path string")
    par = max(spark.sparkContext.defaultParallelism, 1)
    by_bytes = math.ceil(sum(sizes.values()) / max(target_bytes, 1))
    n_tasks = min(len(files), par * math.ceil(max(par, by_bytes) / par))
    groups: list[list[str]] = [[] for _ in range(n_tasks)]
    load = [0] * n_tasks
    for f in sorted(files, key=lambda f: (-sizes[f], f)):
        i = load.index(min(load))
        groups[i].append(f)
        load[i] += sizes[f]
    rdd = spark.sparkContext.parallelize(groups, n_tasks).flatMap(
        lambda g: [(f,) for f in g]
    )
    return spark.createDataFrame(rdd, "path string")


def encode_parquet_dir(
    spark: SparkSession,
    path: str,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    columns: tuple[str, ...] = ("doc_id", "tokens", "n_tok", "source"),
) -> DataFrame:
    """Scan+encode a tokens parquet directory Arrow-natively.

    Each task streams its files in ``chunk_rows`` batches (bounded memory,
    like the reference's 30-row pull batches, src/parquet-to-text-stream.cc:74)
    and emits one encoded-chunk row per batch. Chunk ids are content-stable:
    (file basename, batch ordinal) — reruns produce identical chunks
    regardless of task placement.
    """

    return _encode_files(files_df(spark, path), chunk_rows, columns)


def _encode_files(
    fdf: DataFrame, chunk_rows: int, columns: tuple[str, ...]
) -> DataFrame:
    """Shared fast-path core: one task per file group, per-file streaming
    decode in chunk_rows batches, content-stable chunk ids."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for pdf in batches:
            for fpath in pdf.column(0).to_pylist():
                pf = open_parquet(fpath)
                base = os.path.splitext(os.path.basename(fpath))[0]
                for seq, batch in enumerate(
                    pf.iter_batches(batch_size=chunk_rows, columns=list(columns))
                ):
                    if batch.num_rows:
                        yield encode_batch(batch, chunk_id=f"{base}.{seq:05d}")

    return fdf.mapInArrow(run, ENCODED_SCHEMA_DDL)


def _iceberg_files_df(
    spark: SparkSession, table_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """File-split task frame straight from a snapshot's manifest walk —
    paths AND sizes come from metadata, zero filesystem listing."""
    from . import iceberg_meta

    dfiles = iceberg_meta.snapshot_files(table_dir, snapshot_id)
    return files_df(
        spark,
        None,
        files=[f.path for f in dfiles],
        sizes={f.path: f.file_size for f in dfiles},
    )


def encode_iceberg_snapshot(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: int | None = None,
    chunk_rows: int = DEFAULT_CHUNK_ROWS,
    columns: tuple[str, ...] = ("doc_id", "tokens", "n_tok", "source"),
) -> DataFrame:
    """Snapshot-consistent fast-path encode: the encode sees exactly the
    files of one committed snapshot regardless of concurrent appends (pass
    an older id to encode historical state). Identity-partitioned tables
    are rejected — their partition columns live in paths, not in the data
    files this path streams."""
    from . import iceberg_meta

    meta = iceberg_meta.current_metadata(table_dir)
    if meta is not None and any(
        s["transform"] == "identity"
        for spec in meta.get("partition-specs", [{"spec-id": 0, "fields": []}])
        for s in iceberg_meta._partition_specs(meta, spec["spec-id"])
    ):
        # only IDENTITY partitioning moves table columns out of the data
        # files; derived transforms (bucket/truncate/day...) keep their
        # source columns physically present, so those tables stream fine.
        # Checked across EVERY spec (not just the default): after partition
        # spec evolution, files written under an old identity spec still
        # lack their columns until compaction migrates them
        raise NotImplementedError(
            "fast-path encode of identity-partitioned tables (partition "
            "columns are not in the data files; use read_snapshot + the "
            "keyed encode)"
        )
    if meta is not None and iceberg_meta.snapshot_delete_files(table_dir, snapshot_id):
        # the Arrow file-split scan streams raw data files and would
        # resurrect MoR-deleted rows — refuse, don't corrupt
        raise ValueError(
            "snapshot has pending position deletes; run "
            "iceberg.materialize_deletes before the fast-path encode"
        )
    return _encode_files(
        _iceberg_files_df(spark, table_dir, snapshot_id), chunk_rows, columns
    )


# --- scalar-only verification path (token arrays never cross the JVM) -------


HASH_SCHEMA_DDL = "doc_id string, n_tok int, tok_hash long"


def _hash_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    from ..encode import _tokens_parts
    from ..hashing import row_token_hashes

    values, lengths = _tokens_parts(batch)
    h = row_token_hashes(values, lengths)
    doc = batch.column(batch.schema.get_field_index("doc_id"))
    return pa.RecordBatch.from_arrays(
        [doc, pa.array(lengths.astype(np.int32)), pa.array(h, type=pa.int64())],
        names=["doc_id", "n_tok", "tok_hash"],
    )


def token_hashes_from_parquet(
    spark: SparkSession, path: str, snapshot_id: int | None = None
) -> DataFrame:
    """(doc_id, n_tok, tok_hash) per row, scanning parquet Arrow-natively.

    An Iceberg table path resolves through its snapshot's manifests (NOT a
    directory listing, which would also pick up orphan files from crashed
    writes); ``snapshot_id`` selects historical state, matching an encode
    of the same snapshot."""
    from . import iceberg_meta

    if iceberg_meta.current_version(path) is not None:
        fdf = _iceberg_files_df(spark, path, snapshot_id)
    else:
        fdf = files_df(spark, path)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for pdf in batches:
            for fpath in pdf.column(0).to_pylist():
                pf = open_parquet(fpath)
                for batch in pf.iter_batches(
                    batch_size=DEFAULT_CHUNK_ROWS, columns=["doc_id", "tokens"]
                ):
                    if batch.num_rows:
                        yield _hash_batch(batch)

    return fdf.mapInArrow(run, HASH_SCHEMA_DDL)


def token_hashes_from_encoded(encoded: DataFrame) -> DataFrame:
    """Decode chunks and emit per-row hashes — token arrays stay in Python."""
    from ..encode import decode_chunk_row

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            metas = batch.column(batch.schema.get_field_index("meta"))
            payloads = batch.column(batch.schema.get_field_index("payload"))
            n_rows = batch.column(batch.schema.get_field_index("n_rows"))
            for i in range(batch.num_rows):
                decoded = decode_chunk_row(
                    metas[i].as_py(),
                    payloads[i].as_py(),
                    n_rows[i].as_py(),
                    columns=("doc_id", "tokens"),  # projection pushdown
                )
                yield _hash_batch(decoded)

    return encoded.mapInArrow(run, HASH_SCHEMA_DDL)


def verify_hashes(left: DataFrame, right: DataFrame) -> dict:
    """Distributed scalar-only round-trip verdict: full outer join on doc_id,
    compare (n_tok, tok_hash). Row counts are compared explicitly — a side
    with duplicated doc_ids joins every duplicate as 'ok', so without the
    count check duplicate-row corruption is silent (the reference
    parquet-diff fails on row-count mismatch, src/parquet-diff.cc:238-245).
    Returns {'equal', 'n_left', 'n_right', 'ok', 'missing', 'extra',
    'mismatch'}."""
    l_, r_ = left.alias("l"), right.alias("r")
    n_left, n_right = l_.count(), r_.count()
    joined = l_.join(r_, F.col("l.doc_id") == F.col("r.doc_id"), "full_outer")
    status = (
        F.when(F.col("l.doc_id").isNull(), "extra")
        .when(F.col("r.doc_id").isNull(), "missing")
        .when(
            ~(
                F.col("l.n_tok").eqNullSafe(F.col("r.n_tok"))
                & F.col("l.tok_hash").eqNullSafe(F.col("r.tok_hash"))
            ),
            "mismatch",
        )
        .otherwise("ok")
    )
    counts = {
        row["status"]: row["count"]
        for row in joined.select(status.alias("status")).groupBy("status").count().collect()
    }
    bad = {k: counts.get(k, 0) for k in ("missing", "extra", "mismatch")}
    return {
        "equal": not any(bad.values()) and n_left == n_right,
        "n_left": n_left,
        "n_right": n_right,
        "ok": counts.get("ok", 0),
        **bad,
    }


def read_arrow_ipc(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    """Arrow IPC file(s) -> DataFrame: the reverse direction of the
    parquet-to-arrow tool, so its outputs are first-class inputs again.
    Same file-split pattern as the parquet scan: tasks receive file paths,
    pyarrow.ipc reads record batches inside the worker (zero-copy mmap),
    batches stream straight out — no driver materialization, no shuffle."""

    def _open(fpath: str):
        if "://" not in fpath:
            return pa.memory_map(fpath, "r")  # local: zero-copy mmap
        from pyarrow import fs as pafs

        filesystem, p = pafs.FileSystem.from_uri(fpath)
        return filesystem.open_input_file(p)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for pdf in batches:
            for fpath in pdf.column(0).to_pylist():
                with _open(fpath) as src:
                    reader = pa.ipc.open_file(src)
                    for i in range(reader.num_record_batches):
                        b = reader.get_batch(i)
                        if not b.num_rows:
                            continue
                        # dictionary columns (preserved by parquet-to-arrow)
                        # decode at the Spark boundary — Spark's Arrow vector
                        # has no dictionary accessor
                        cols = [
                            c.dictionary_decode() if pa.types.is_dictionary(c.type) else c
                            for c in b.columns
                        ]
                        yield pa.RecordBatch.from_arrays(cols, names=b.schema.names)

    files = [qualify_path(i.path, path) for i in resolve_files(path, suffix=".arrow")[1]]
    rdd = spark.sparkContext.parallelize([(f,) for f in files], max(len(files), 1))
    return spark.createDataFrame(rdd, "path string").mapInArrow(run, ddl)


def write_bucketed_table(
    df, table_name: str, path: str, key: str = "doc_id", n_buckets: int = 64
) -> None:
    """Bucketed external table: hash-bucketed by ``key`` into ``n_buckets``
    files per partition, sorted within buckets.

    The 100 TB co-location technique the brief names explicitly: two tables
    bucketed the same way join WITHOUT an Exchange on either side (the scan
    itself satisfies the join's distribution requirement), so a repeated
    join against a huge keyed corpus — dedup verdicts, per-doc stats,
    packing metadata — pays the shuffle once at write time instead of on
    every query. Pinned by tests/test_plans.py."""
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table_name)
    )
