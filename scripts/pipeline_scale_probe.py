"""Scale probe for the pipeline-assembly cores (BENCH/BASELINE.md).

Times the two nontrivial distributed algorithms on inputs ~10^4x the
driver-gate scale, all synthesized JVM-side (no files):

1. _packed: the grouped distributed prefix sum on 50M (doc_id, n_tok)
   rows — the machinery behind pack_sequences / training_mix. Checks the
   last document's (seq_id, seq_offset) against the closed-form total.
2. connected_components: 10M nodes with 1M planted 10-node star groups
   (hub keys — the skew shape) PLUS one 4096-deep chain (the depth shape
   pointer jumping exists for). Checks every star resolves to its hub
   and the whole chain resolves to its head.
3. near_dup_clusters_minhash END TO END at 2M docs (the measured ceiling
   of this box's single disk — see the in-function disk-bound note): OPH
   signatures -> capped LSH banding -> exact hash-set Jaccard verify ->
   CC, over synthetic groups of 5 identical texts (400k expected
   clusters). Checks every doc lands in its group's min-id cluster — the
   minhash-seeded candidate path at 4x10^3 the driver-gate scale.

Usage: python scripts/pipeline_scale_probe.py [n_pack_rows] [n_star_nodes] [n_minhash_docs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_arrow_spark.operators.pipeline import PACK_CAP, _packed, connected_components
from parquet_to_arrow_spark.session import get_spark

N_PACK = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
N_STARS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
N_MH = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000_000
CHAIN = 4096
GROUP = 5  # docs per planted duplicate group in the minhash probe


def probe_pack(spark) -> dict:
    # n_tok in [1, 512], deterministic in doc_id; exact total is checkable
    t = spark.range(N_PACK).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(512)) + 1).alias("n_tok"),
    )
    total = t.agg(F.sum("n_tok")).collect()[0][0]
    t0 = time.time()
    out = _packed(t, [], PACK_CAP)
    last = out.orderBy(F.desc("doc_id")).limit(1).collect()[0]
    dt = time.time() - t0
    start_last = total - last["n_tok"]
    assert last["seq_id"] == start_last // PACK_CAP, last
    assert last["seq_offset"] == start_last % PACK_CAP, last
    return {
        "probe": "packed_prefix_sum",
        "rows": N_PACK,
        "total_tokens": int(total),
        "n_sequences": int(total // PACK_CAP) + 1,
        "seconds": round(dt, 1),
        "mrows_per_s": round(N_PACK / dt / 1e6, 1),
    }


def probe_cc(spark) -> dict:
    nodes = spark.range(N_STARS + CHAIN).select(F.col("id").alias("doc_id"))
    stars = spark.range(N_STARS).filter("id % 10 != 0").select(
        F.col("id").alias("doc_a"), (F.col("id") - F.col("id") % 10).alias("doc_b")
    )
    chain = spark.range(N_STARS, N_STARS + CHAIN - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    t0 = time.time()
    labels = connected_components(nodes, stars.union(chain)).cache()
    bad_stars = labels.filter(
        (F.col("doc_id") < N_STARS)
        & (F.col("cluster_id") != F.col("doc_id") - F.col("doc_id") % 10)
    ).count()
    bad_chain = labels.filter(
        (F.col("doc_id") >= N_STARS) & (F.col("cluster_id") != N_STARS)
    ).count()
    dt = time.time() - t0
    assert bad_stars == 0 and bad_chain == 0, (bad_stars, bad_chain)
    return {
        "probe": "connected_components",
        "nodes": N_STARS + CHAIN,
        "edges": int(N_STARS * 9 / 10) + CHAIN - 1,
        "chain_depth": CHAIN,
        "seconds": round(dt, 1),
    }


def probe_minhash_clusters(spark) -> dict:
    from parquet_to_arrow_spark.operators.pipeline import near_dup_clusters_minhash

    # groups of GROUP docs share one md5-derived text (exact duplicates ->
    # identical signatures -> guaranteed LSH candidates); doc ids are
    # zero-padded so string min == numeric min within a group. 16-char
    # texts (64 bits — groups can't collide) keep the shingle fan-out at
    # 12 rows/doc. Disk bound, MEASURED (df polled at 5 s during runs,
    # zstd shuffle blocks, 45 s cleaner GC): the full pipeline's ~8
    # concurrent shuffle boundaries (shingle agg, banding+window, pair
    # dedup, signature rejoin, hash-set rejoin, CC rounds) peak at 26 GB
    # of single-disk spill at 2M docs (13 KB/doc) and ~74 GB at 4M
    # (18.5 KB/doc — superlinear: external-sort runs multiply), so this
    # box's SINGLE ~70 GB-free disk caps the leg at 2M docs (4M/5M/10M/
    # 20M all ENOSPC'd). That is the box's bound, not the plan's: every
    # shuffle is key-partitioned, so a cluster spreads the same bytes
    # across executors' local disks — at 50M docs and 32 executors the
    # per-executor share is ~30 GB, a routine provisioning number
    docs = spark.range(N_MH).select(
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 11, "0")).alias(
            "doc_id"
        ),
        F.substring(
            F.md5((F.col("id") - F.col("id") % GROUP).cast("string")), 1, 16
        ).alias("text"),
    )
    t0 = time.time()
    labels = near_dup_clusters_minhash(spark, sf_dir="", docs=docs).cache()
    n = labels.count()
    # every doc's cluster must be its group's min doc_id, size == GROUP
    expect = F.concat(
        F.lit("d"),
        F.lpad(
            (
                F.substring("doc_id", 2, 11).cast("long")
                - F.substring("doc_id", 2, 11).cast("long") % GROUP
            ).cast("string"),
            11,
            "0",
        ),
    )
    bad = labels.filter(
        (F.col("cluster_id") != expect) | (F.col("cluster_size") != GROUP)
    ).count()
    dt = time.time() - t0
    labels.unpersist()
    assert n == N_MH and bad == 0, (n, bad)
    return {
        "probe": "near_dup_clusters_minhash",
        "docs": N_MH,
        "expected_clusters": N_MH // GROUP,
        "seconds": round(dt, 1),
        "kdocs_per_s": round(N_MH / dt / 1e3, 1),
    }


if __name__ == "__main__":
    # 256 shuffle partitions: the minhash leg shuffles ~28 shingle rows per
    # doc — 32 partitions would put tens of millions of rows in each
    # aggregation task's buffer; AQE coalesces the small legs back.
    # zstd shuffle blocks (~1.5x denser than lz4 on hash-heavy longs) and a
    # 45 s cleaner GC (reclaims shuffle files the CC rounds' checkpoints
    # have orphaned mid-job) keep the single-disk spill peak inside this
    # box's ~70 GB free — on a cluster both are nice-to-haves, not survival
    spark = get_spark(
        app="pipeline_scale_probe",
        shuffle_partitions=256,
        extra={
            "spark.io.compression.codec": "zstd",
            "spark.cleaner.periodicGC.interval": "45s",
        },
    )
    for fn in (probe_pack, probe_cc, probe_minhash_clusters):
        print(json.dumps(fn(spark)), flush=True)
    spark.stop()
