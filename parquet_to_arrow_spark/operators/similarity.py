"""Similarity search over the embeddings table (vec_id, embedding: array<float>, label).

- Brute-force cosine top-k: the correctness baseline. Queries broadcast
  (tiny), corpus streams — at 100 TB this is one scan, no shuffle until the
  per-query top-k (window over query partitions).
- LSH-bucketed ANN: deterministic random-hyperplane signatures (hyperplane
  weights are a pure splitmix64 function of (plane, dim) — no RNG state to
  ship), bucket equi-join, exact re-rank inside buckets. The scale path:
  candidate set shrinks by ~2^bits.
- Embedding near-dup: cosine >= threshold pairs via the same LSH buckets.

Dot products run JVM-side via F.zip_with + F.aggregate in double precision
(left-to-right fold — deterministic), so no Python UDF in the hot path.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(spark, sf_dir, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Exact cosine top-k for the first ``n_queries`` vectors (by vec_id)."""
    emb = _emb(spark, sf_dir)
    queries = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .withColumn("sim", cosine(F.col("q"), F.col("embedding")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


def _hyperplane_sign_cols(dim: int, n_planes: int = N_PLANES):
    """Deterministic ±1 hyperplane matrix from splitmix64(plane, dim)."""

    def mix(p: int, d: int) -> int:
        z = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        z ^= z >> 30
        z = (z * 0xD6E8FEB86659FD93) % (1 << 64)
        z ^= z >> 27
        return z

    return [
        [1.0 if (mix(p, d) >> 13) & 1 else -1.0 for d in range(dim)] for p in range(n_planes)
    ]


def lsh_signatures(emb: DataFrame, dim: int, n_planes: int = N_PLANES) -> DataFrame:
    planes = _hyperplane_sign_cols(dim, n_planes)
    sig = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(x) for x in w]),
                lambda x, yy: x.cast("double") * yy,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig.bitwiseOR(F.shiftleft(F.when(proj > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), p))
    return emb.withColumn("bucket", sig)


def ann_lsh_topk(spark, sf_dir, n_queries: int = 5, k: int = 10) -> DataFrame:
    """Bucketed ANN: candidates share the query's hyperplane signature."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    sig = lsh_signatures(emb, dim).cache()
    queries = sig.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q"),
        F.col("bucket").alias("qbucket"),
    )
    cands = sig.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
    ).withColumn("sim", cosine(F.col("q"), F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", F.round("sim", 6).alias("sim_r"))
    )


def embedding_near_dup_pairs(spark, sf_dir, threshold: float = 0.2) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) within LSH buckets."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    sig = lsh_signatures(emb, dim)
    a = sig.select("bucket", F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = sig.select("bucket", F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim_r"))
    )
