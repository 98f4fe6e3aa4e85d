"""Scale probe for the round-4 lakehouse surfaces (BENCH/BASELINE.md):

1. BLOOM INDEX over a 256-file / 5.1M-row table of hash-distributed doc
   ids: index build time (one task per file), index size, and the
   measured candidate-file count over present/absent point lookups —
   min/max bounds prune NOTHING on this key shape (every file spans the
   key space); the bloom prunes to ~1 file.
2. Z-ORDER COMPACTION of 8M (x, y) rows from 64 interleaved files:
   measured file-hit fraction of narrow single-dimension range filters on
   BOTH dimensions, against the sort_by baseline that serves only its
   leading column.
3. CHANGELOG over an initial 2M-row append + 16 CDC upsert snapshots x
   100k updates: read_changelog build + a DISTRIBUTED replay check (last
   insert per key across ordinals == live table, exceptAll both ways).

4. DELETION VECTORS: 1M rows deleted from a 4M-row table through BOTH
   position-delete representations (v2 parquet / v3 Puffin DV) — artifact
   bytes, write wall, MoR read wall, identical survivors.
5. DISTRIBUTED BLOOM at 10,240 files: column-expression membership vs the
   driver-side loop, key-for-key agreement.

Usage: python scripts/lakehouse_probe.py [leg ...]
       (default: bloom bloom_dist dv zorder changelog pq)
Prints one JSON line per leg.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from parquet_to_arrow_spark.session import get_spark

WORK = os.environ.get("LAKEHOUSE_PROBE_DIR", "/tmp/lakehouse_probe")


def bloom_leg(spark):
    from parquet_to_arrow_spark.sources import bloom_index as bi
    from parquet_to_arrow_spark.sources import iceberg_meta as ice
    from parquet_to_arrow_spark.sources.iceberg import append

    tab = f"{WORK}/bloom_tab"
    shutil.rmtree(tab, ignore_errors=True)
    n, files = 5_120_000, 256
    df = (
        spark.range(n)
        .select(
            F.format_string(
                "doc-%013d", F.abs(F.xxhash64(F.col("id"))) % F.lit(10**13)
            ).alias("doc_id"),
            F.col("id").alias("n"),
        )
        .repartition(files)
    )
    append(df, tab)
    t0 = time.time()
    idx_path = bi.build_bloom_index(spark, tab, "doc_id")
    t_build = time.time() - t0
    idx_bytes = os.path.getsize(idx_path)
    present = [
        r["doc_id"]
        for r in ice.read_snapshot(spark, tab)
        .select("doc_id")
        .limit(50)
        .collect()
    ]
    t0 = time.time()
    hits = [len(bi.bloom_candidate_files(tab, "doc_id", k)) for k in present]
    absent = [
        len(bi.bloom_candidate_files(tab, "doc_id", f"doc-x{i}"))
        for i in range(50)
    ]
    t_lookup = (time.time() - t0) / 100
    row = bi.point_lookup(spark, tab, "doc_id", present[0]).collect()
    assert row and row[0]["doc_id"] == present[0]
    return {
        "leg": "bloom_index",
        "rows": n,
        "files": files,
        "build_s": round(t_build, 1),
        "index_mib": round(idx_bytes / 2**20, 2),
        "mean_candidates_present": sum(hits) / len(hits),
        "mean_candidates_absent": sum(absent) / len(absent),
        "lookup_ms": round(t_lookup * 1000, 1),
    }


def bloom_dist_leg(spark):
    """Distributed membership at >=10^4 files: the driver-side candidate
    loop and the column-expression path must agree key-for-key, and the
    distributed path's cost must stay file-count-shaped (one broadcast
    join over the index frame, no blob parse on the driver)."""
    from parquet_to_arrow_spark.sources import bloom_index as bi
    from parquet_to_arrow_spark.sources import iceberg_meta as ice
    from parquet_to_arrow_spark.sources.iceberg import append

    tab = f"{WORK}/bloom_dist_tab"
    shutil.rmtree(tab, ignore_errors=True)
    n, files = 5_120_000, 10_240
    df = (
        spark.range(n)
        .select(
            F.format_string(
                "doc-%013d", F.abs(F.xxhash64(F.col("id"))) % F.lit(10**13)
            ).alias("doc_id"),
            F.col("id").alias("n"),
        )
        .repartition(files)
    )
    append(df, tab)
    t0 = time.time()
    idx_path = bi.build_bloom_index(spark, tab, "doc_id")
    t_build = time.time() - t0
    present = [
        r["doc_id"]
        for r in ice.read_snapshot(spark, tab).select("doc_id").limit(8).collect()
    ]
    keys = present + [f"doc-x{i}" for i in range(8)]
    t0 = time.time()
    drv = [sorted(bi.bloom_candidate_files(tab, "doc_id", k)) for k in keys]
    t_drv = (time.time() - t0) / len(keys)
    t0 = time.time()
    dist = [
        sorted(
            r["path"]
            for r in bi.bloom_candidate_files_distributed(
                spark, tab, "doc_id", k
            ).collect()
        )
        for k in keys
    ]
    t_dist = (time.time() - t0) / len(keys)
    assert dist == drv, "distributed membership diverged from driver-side"
    n_cand_present = [len(c) for c in dist[: len(present)]]
    n_cand_absent = [len(c) for c in dist[len(present):]]
    return {
        "leg": "bloom_distributed",
        "rows": n,
        "files": files,
        "build_s": round(t_build, 1),
        "index_mib": round(os.path.getsize(idx_path) / 2**20, 2),
        "mean_candidates_present": sum(n_cand_present) / len(n_cand_present),
        "mean_candidates_absent": sum(n_cand_absent) / len(n_cand_absent),
        "driver_lookup_s": round(t_drv, 2),
        "distributed_lookup_s": round(t_dist, 2),
        "paths_agree": True,
    }


def dv_leg(spark):
    """Deletion vectors vs v2 position-delete parquet at 10^6 deleted rows:
    same 4M-row table, same predicate deleted through both representations
    — compare delete-artifact bytes, write wall, and the MoR read wall, and
    assert both reads return identical survivors."""
    from parquet_to_arrow_spark.sources import iceberg_meta as ice
    from parquet_to_arrow_spark.sources.iceberg import (
        append,
        delete_where_dv,
        delete_where_mor,
        read_table,
    )

    n, files = 4_000_000, 32
    out = {"leg": "deletion_vectors", "rows": n, "deleted": n // 4}
    counts = {}
    for mode, fn in (("v2_parquet", delete_where_mor), ("v3_dv", delete_where_dv)):
        tab = f"{WORK}/dv_{mode}"
        shutil.rmtree(tab, ignore_errors=True)
        append(
            spark.range(n).selectExpr(
                "id AS doc_id", "CAST(id AS STRING) AS text"
            ).repartition(files),
            tab,
        )
        t0 = time.time()
        fn(spark, tab, "doc_id % 4 = 1")
        t_del = time.time() - t0
        dels = ice.snapshot_delete_files(tab)
        t0 = time.time()
        counts[mode] = read_table(spark, tab).count()
        t_read = time.time() - t0
        out[mode] = {
            "delete_bytes": sum(f.content_size or f.file_size for f in dels),
            "delete_entries": len(dels),
            "write_s": round(t_del, 1),
            "mor_read_s": round(t_read, 1),
        }
    assert counts["v2_parquet"] == counts["v3_dv"] == n - n // 4, counts
    out["bytes_ratio_v2_over_dv"] = round(
        out["v2_parquet"]["delete_bytes"] / max(out["v3_dv"]["delete_bytes"], 1), 1
    )
    return out


def zorder_leg(spark):
    from parquet_to_arrow_spark.sources import iceberg_meta as ice
    from parquet_to_arrow_spark.sources.iceberg import append, compact_files

    out = {}
    n, files, span = 8_000_000, 64, 1 << 20
    for mode in ("zorder", "sort"):
        tab = f"{WORK}/z_{mode}"
        shutil.rmtree(tab, ignore_errors=True)
        df = spark.range(n).select(
            F.col("id"),
            (F.abs(F.xxhash64("id")) % span).alias("x"),
            (F.abs(F.xxhash64(F.col("id") + 1)) % span).alias("y"),
        )
        append(df.repartition(files), tab)
        t0 = time.time()
        kw = (
            {"zorder": ["x", "y"]}
            if mode == "zorder"
            else {"sort_by": "x"}
        )
        # every input file must be UNDER target to be eligible, while
        # ceil(total/target) sets the output count — max_size+1 gives both
        # (inputs are near-equal, so n_out lands at ~files-1)
        sizes = [f.file_size for f in ice.snapshot_files(tab)]
        compact_files(spark, tab, target_bytes=max(sizes) + 1, **kw)
        t_c = time.time() - t0
        nf = len(ice.snapshot_files(tab))
        band = span // 64  # 1/64th of the range
        hx = hy = 0
        probes = 32
        for i in range(probes):
            lo = (i * 104729) % (span - band)
            hx += len(ice.snapshot_files(tab, range_filter={"x": (lo, lo + band)}))
            hy += len(ice.snapshot_files(tab, range_filter={"y": (lo, lo + band)}))
        out[mode] = {
            "compact_s": round(t_c, 1),
            "files": nf,
            "hit_frac_x": round(hx / probes / nf, 3),
            "hit_frac_y": round(hy / probes / nf, 3),
        }
    return {"leg": "zorder", "rows": n, **out}


def changelog_leg(spark):
    from parquet_to_arrow_spark.sources import iceberg_meta as ice
    from parquet_to_arrow_spark.sources.iceberg import append, read_table, upsert_keys_mor

    tab = f"{WORK}/cl_tab"
    shutil.rmtree(tab, ignore_errors=True)
    n, batches, bsz = 2_000_000, 16, 100_000
    # k via the same modulo arithmetic as the upserts, so nullability (and
    # therefore the iceberg schema) matches across commits
    append(
        spark.range(n).select(
            (F.col("id") % n).alias("k"), F.lit(0).alias("ver")
        ).repartition(16),
        tab,
    )
    t0 = time.time()
    for b in range(1, batches + 1):
        upd = spark.range(bsz).select(
            ((F.col("id") * 7919 + b) % n).alias("k"), F.lit(b).alias("ver")
        ).dropDuplicates(["k"])
        upsert_keys_mor(spark, tab, upd, "k")
    t_upserts = time.time() - t0
    t0 = time.time()
    cl = ice.read_changelog(spark, tab)
    ins = cl.filter(F.col("_change_op") == "insert")
    final = ins.groupBy("k").agg(
        F.max(F.struct("_change_ordinal", "ver")).alias("m")
    ).select("k", F.col("m.ver").alias("ver"))
    live = read_table(spark, tab).select("k", "ver")
    d1 = final.exceptAll(live).count()
    d2 = live.exceptAll(final).count()
    t_replay = time.time() - t0
    n_ops = cl.groupBy("_change_op").count().collect()
    assert d1 == 0 and d2 == 0, (d1, d2)
    return {
        "leg": "changelog",
        "rows": n,
        "upsert_snapshots": batches,
        "upserts_s": round(t_upserts, 1),
        "replay_check_s": round(t_replay, 1),
        "ops": {r["_change_op"]: r["count"] for r in n_ops},
        "replay_matches_live": True,
    }


def pq_leg(spark):
    """PQ ANN at 1M synthetic 64-dim vectors (deterministic hash-derived
    components, 16 loose clusters so neighbors exist): codebook train on
    the 65k hash-ordered sample, full-corpus encode to 8-byte codes, ADC
    top-k for 5 queries with exact re-rank, and recall@10 against the
    distributed brute-force truth."""
    import pandas as pd

    from pyspark.sql import functions as F
    from parquet_to_arrow_spark.operators import similarity as sim

    n, dim = 1_000_000, 64
    path = f"{WORK}/pq_emb"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        def gen(pdfs):
            import numpy as np

            # every vector is hash-noise around a BASE id; the last 50 ids
            # are planted: 10 tight satellites around each of the 5 query
            # ids (0..4), so the true top-10 of each query is known and
            # recall measures whether the pipeline finds real structure —
            # uniform noise or giant near-tie clusters both make "top-10"
            # statistically undecidable for any quantizer
            def h(x, salt):
                x = (x + np.uint64(salt)) * np.uint64(0x9E3779B97F4A7C15)
                x ^= x >> np.uint64(31)
                return (x % np.uint64(1000)).astype(np.float64) / 500 - 1

            for pdf in pdfs:
                ids = pdf["id"].to_numpy().astype(np.uint64)
                planted = ids >= np.uint64(n - 50)
                base = np.where(
                    planted, (ids - np.uint64(n - 50)) // np.uint64(10), ids
                ).astype(np.uint64)
                jscale = np.where(planted, 0.02, 0.0)[:, None]
                m = np.stack([h(base, 7919 + d) for d in range(dim)], axis=1)
                jit = np.stack([h(ids, 104729 + d) for d in range(dim)], axis=1)
                m = m + jscale * jit
                yield pd.DataFrame(
                    {
                        "vec_id": ids.astype(np.int64),
                        "embedding": list(m.astype(np.float32)),
                    }
                )

        (
            spark.range(n)
            .repartition(64)
            .mapInPandas(gen, "vec_id long, embedding array<float>")
            .write.mode("overwrite")
            .parquet(path)
        )
    emb = spark.read.parquet(path)
    t0 = time.time()
    books = sim.pq_codebooks(emb, m=8, ks=256)
    t_train = time.time() - t0
    t0 = time.time()
    codes = sim.pq_codes(emb, books)
    codes.write.mode("overwrite").parquet(f"{WORK}/pq_codes")
    t_enc = time.time() - t0
    # ADC + rerank via the same machinery ann_pq_topk uses, inline over
    # the synthetic corpus (ann_pq_topk's signature reads a sf_dir)
    import numpy as np

    qrows = emb.orderBy("vec_id").limit(5).collect()
    qv = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    def topk(scored_col):
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.col(scored_col).desc(), F.col("vec_id"))
        return F.row_number().over(w)

    qdf = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in np.asarray(r["embedding"], np.float64)]) for r in qrows],
        "query_id long, q array<double>")
    dot = F.aggregate(
        F.zip_with("q", "embedding", lambda a, b: a * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    t0 = time.time()
    bf = (
        emb.crossJoin(F.broadcast(qdf))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", dot / norm)
        .withColumn("rank", topk("sim"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id")
        .collect()
    )
    t_bf = time.time() - t0
    truth = {(r["query_id"], r["vec_id"]) for r in bf}
    t0 = time.time()
    got = _pq_search(spark, spark.read.parquet(f"{WORK}/pq_codes"), emb, books, qrows, k=10)
    t_pq = time.time() - t0
    recall = len(got & truth) / len(truth)
    return {
        "leg": "pq_ann",
        "rows": n,
        "train_s": round(t_train, 1),
        "encode_s": round(t_enc, 1),
        "bruteforce_s": round(t_bf, 1),
        "pq_search_s": round(t_pq, 1),
        "recall_at_10": recall,
    }


def _pq_search(spark, codes, emb, books, qrows, k=10):
    """ADC + exact re-rank over a codes frame (the ann_pq_topk core against
    explicit frames)."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window, functions as F

    m, ks, sub = books.shape
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qv = np.stack([np.asarray(r["embedding"], np.float64) for r in qrows])
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)
    tabs = np.stack([qv[:, j * sub:(j + 1) * sub] @ books[j].T for j in range(m)], axis=1)
    keep = 4 * k

    def score(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            vid = pdf["vec_id"].to_numpy()
            cm = np.stack(pdf["codes"].to_list()).astype(np.int64)
            outs = []
            for qi in range(len(qids)):
                s = np.zeros(len(vid))
                for j in range(m):
                    s += tabs[qi, j][cm[:, j]]
                mask = vid != qids[qi]
                order = np.argsort(-s[mask])[:keep]
                outs.append(pd.DataFrame(
                    {"query_id": qids[qi], "vec_id": vid[mask][order],
                     "adc": s[mask][order]}))
            yield pd.concat(outs)

    cands = codes.mapInPandas(score, "query_id long, vec_id long, adc double")
    w = Window.partitionBy("query_id").orderBy(F.col("adc").desc(), F.col("vec_id"))
    short = cands.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= keep).drop("r", "adc")
    qdf = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, q array<float>")
    dot = F.aggregate(F.zip_with("q", "embedding", lambda a, b: a.cast("double") * b.cast("double")),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = F.sqrt(F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    exact = (short.join(emb, "vec_id").join(F.broadcast(qdf), "query_id")
             .withColumn("sim", dot / norm))
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    rows = (exact.withColumn("rank", F.row_number().over(w2))
            .filter(F.col("rank") <= k).select("query_id", "vec_id").collect())
    return {(r["query_id"], r["vec_id"]) for r in rows}


if __name__ == "__main__":
    legs = sys.argv[1:] or ["bloom", "bloom_dist", "dv", "zorder", "changelog", "pq"]
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    os.makedirs(WORK, exist_ok=True)
    for leg in legs:
        fn = {"bloom": bloom_leg, "bloom_dist": bloom_dist_leg,
              "dv": dv_leg, "zorder": zorder_leg, "changelog": changelog_leg,
              "pq": pq_leg}[leg]
        t0 = time.time()
        res = fn(spark)
        res["wall_s"] = round(time.time() - t0, 1)
        print(json.dumps(res), flush=True)
    spark.stop()
