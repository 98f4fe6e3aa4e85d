"""Deduplication operators over the documents table.

Scale design notes (100 TB):
- exact: one hash-shuffle on the content fingerprint (md5), min-key wins.
- MinHash+LSH: one md5-derived hash per shingle (one-permutation hashing:
  single explode + single groupBy, no per-permutation passes), band into
  B buckets, per-band candidate cap, self-join per bucket, verify candidate
  pairs. All JVM-side; the shuffle key is the band signature, so skewed
  popular shingles never form a hot key.
- SimHash: vectorized bit-majority in a single pandas-free pipeline using
  explode + bitwise aggs.
- n-gram Jaccard: exact verification on LSH candidates (or small inputs),
  with stop-shingle removal (document frequency cap) to bound the join.
- embedding near-dup: see similarity.py (cosine over the embeddings table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

# K=64 signatures in 16 bands of 4 rows: the (1/b)^(1/r) S-curve threshold
# is (1/16)^(1/4) = 0.5 — exactly the operator's default similarity
# threshold — and est_jaccard granularity improves from 1/16 to 1/64.
N_MINHASH = 64
_BIN_BITS = 6
assert N_MINHASH == 1 << _BIN_BITS
N_BANDS = 16  # 4 rows per band
SHINGLE = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the session's parallelism when the scan produced
    fewer splits than cores (a small single-file input otherwise runs every
    pre-shuffle stage — the shingle/word EXPLODE, the expensive part — on
    one task). No-op at scale where inputs already have >= cores splits."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def content_fp(col=None):
    """The exact-dedup grouping key: md5 of the raw UTF-8. Grouping by the
    128-bit fingerprint instead of the text itself keeps the dedup shuffle
    narrow — (fp, doc_id) rows, ~25× less wire than full documents — which
    is the difference between feasible and not at 100 TB. (Industry-standard
    md5-collision risk accepted, as in every content-addressed store.)"""
    return F.md5(F.encode(col if col is not None else F.col("text"), "UTF-8"))


def exact_dedup_groups(spark, sf_dir) -> DataFrame:
    """Exact duplicate groups by content: keeper id + group size per text.
    One hash shuffle carrying only (fp, doc_id)."""
    return (
        _docs(spark, sf_dir)
        .select(content_fp().alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def exact_dedup_kept(spark, sf_dir) -> DataFrame:
    """The deduplicated corpus: one row per distinct text (min doc_id wins).
    Keepers are resolved on (fp, doc_id) — full text never shuffles — then a
    semi join on doc_id selects the surviving rows in place."""
    df = _docs(spark, sf_dir)
    keep = (
        df.select(content_fp().alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return df.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "n_chars"
    )


def doc_shingles(df: DataFrame, k: int = SHINGLE) -> DataFrame:
    """Distinct char k-gram shingles per doc, derived JVM-side."""
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
    sh = F.array_distinct(F.transform(idx, lambda i: F.substr("text", i, F.lit(k))))
    return _spread(df).select("doc_id", F.explode(sh).alias("shingle"))


def _md5_signed64(col):
    """(signed 64-bit hash, unsigned hi half) derived from md5(col): the two
    32-bit hex halves recombined as hi_signed * 2^32 + lo. md5 exists in
    every SQL engine, so operators built on this hash have EXACT DuckDB
    oracle twins (xxhash64 does not — the same trick that upgraded simhash64
    in round 2). All intermediates fit signed 64-bit exactly:
    hi_signed ∈ [-2^31, 2^31) ⇒ product ∈ [-2^63, 2^63-2^32], + lo < 2^32
    never overflows ANSI arithmetic."""
    hx = F.md5(col)
    hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
    h = (
        hi - F.when(hi >= F.lit(2147483648), F.lit(4294967296)).otherwise(F.lit(0))
    ) * F.lit(4294967296) + lo
    return h, hi


def minhash_signatures(spark, sf_dir, docs: DataFrame | None = None) -> DataFrame:
    """K min-hashes per doc via ONE-PERMUTATION HASHING (Li/Owen/Zhang,
    NeurIPS 2012): each shingle is hashed ONCE, assigned to one of K bins by
    the hash's own top bits, and the signature is the per-bin minimum — K
    signatures for the price of one string hash per shingle instead of K
    (the naive K-seeded form cost 64 hash evaluations per shingle row and
    dominated the dedup bench). The hash is md5-derived (_md5_signed64), so
    the whole signature — and therefore minhash_lsh_pairs — has an exact
    DuckDB oracle. Within a bin the top 6 bits are constant, so the SIGNED
    per-bin min ranks identically to the unsigned one (two's-complement
    order is monotone when the sign bit is fixed) — the standard OPH
    construction, engine-portable. Empty bins are densified with
    md5(global_min ':' bin): for two docs both missing bin i the fill
    collides exactly when their global minima collide — itself a minhash
    event — so the estimator stays honest; single-sided empties almost
    never collide (slight underestimate)."""
    if docs is None:
        docs = _docs(spark, sf_dir)
    sh = doc_shingles(docs)
    h, hi = _md5_signed64(F.col("shingle"))
    binned = sh.select(
        "doc_id",
        h.alias("h"),
        F.shiftright(hi, 32 - _BIN_BITS).alias("bin"),
    )
    binmin = binned.groupBy("doc_id", "bin").agg(F.min("h").alias("mh"))
    # signature as ONE array<long> column (not K scalar columns: 64-column
    # plans generate pathological whole-stage code — cold codegen alone cost
    # seconds); map lookup + densification in a single transform
    m = F.map_from_entries(F.collect_list(F.struct("bin", "mh")))
    per_doc = binmin.groupBy("doc_id").agg(m.alias("__m"))
    g = F.array_min(F.map_values(F.col("__m")))

    def _fill(i):
        fh, _ = _md5_signed64(F.concat_ws(":", g.cast("string"), i.cast("string")))
        return fh

    sig = F.transform(
        F.sequence(F.lit(0), F.lit(N_MINHASH - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__m"), i.cast("long")), _fill(i)),
    )
    return per_doc.select("doc_id", sig.alias("sig"))


DEFAULT_BAND_CAP = 4096


def minhash_lsh_pairs(
    spark,
    sf_dir,
    threshold: float = 0.5,
    band_cap: int = DEFAULT_BAND_CAP,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + exact MinHash-similarity
    verification; returns (doc_a, doc_b, est_jaccard).

    Scale shape: the band self-join carries ONLY (band_hash, doc_id) — the
    K signature columns rejoin on the (much smaller) candidate set
    afterwards, so the banding shuffle stays narrow at 10^12 rows.

    Skew guard: at most ``band_cap`` docs survive per band value before the
    self-join (deterministic row_number, overflow OBSERVED via
    'minhash_band_overflow' — the cap_buckets pattern from similarity.py).
    A corpus with mass-duplicated boilerplate puts millions of docs into one
    band; without the cap that band's pair count is quadratic. Capped docs
    in an over-full band are exact/near-exact duplicates of the survivors,
    which exact_dedup (or a keep-one pass over the survivors) already
    handles — the cap costs recall only for the pathological band, bounded
    and measured, instead of an unbounded join.
    """
    sig = minhash_signatures(spark, sf_dir, docs=docs).cache()
    rows_per_band = N_MINHASH // N_BANDS
    band_cols = [
        F.xxhash64(
            F.slice("sig", b * rows_per_band + 1, rows_per_band), F.lit(b)
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    bands = sig.select("doc_id", *band_cols).select(
        "doc_id",
        F.explode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias("band"),
    )
    w = Window.partitionBy("band").orderBy(F.xxhash64(F.col("doc_id")))
    ranked = bands.withColumn("__rk", F.row_number().over(w)).observe(
        "minhash_band_overflow",
        F.sum((F.col("__rk") > band_cap).cast("long")).alias("overflow_rows"),
        F.count(F.lit(1)).alias("total_rows"),
    )
    bands = ranked.filter(F.col("__rk") <= band_cap).drop("__rk")
    left, right = bands.alias("l"), bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band")) & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    matches = F.aggregate(
        F.zip_with(
            F.col("sig_a"),
            F.col("sig_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", matches / F.lit(float(N_MINHASH)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def ngram_jaccard_pairs(spark, sf_dir, threshold: float = 0.3, max_df: int = 64) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a rare shingle.

    Stop-shingle removal (document frequency > max_df dropped) bounds the
    self-join fan-out — the skew guard that matters at scale.
    """
    docs = _docs(spark, sf_dir)
    sh = doc_shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = sh.join(
        sh.groupBy("shingle").count().filter(F.col("count") <= max_df).select("shingle"),
        "shingle",
        "left_semi",
    )
    a, b = rare.alias("a"), rare.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )


def simhash64(spark, sf_dir) -> DataFrame:
    """64-bit SimHash per doc: word-level hashes, per-bit majority vote,
    computed with shiftright/bitwise aggs — no Python in the loop.

    The word hash is the two 32-bit halves of md5(word) (bits 0-31 from hex
    chars 9-16, bits 32-63 from chars 1-8): md5 is available in every SQL
    engine, so the whole operator has an exact DuckDB oracle twin (xxhash64
    does not exist in DuckDB and would leave this rows-only-checked). md5 is
    ~3x slower per word than xxhash64 but the explode dominates this
    pipeline, not the hash."""
    docs = _spread(_docs(spark, sf_dir))
    words = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    words = (
        words.filter(F.length("w") > 0)
        .withColumn("hx", F.md5(F.col("w")))
        .withColumn("hi", F.conv(F.substring("hx", 1, 8), 16, 10).cast("long"))
        .withColumn("lo", F.conv(F.substring("hx", 9, 8), 16, 10).cast("long"))
    )
    # Per-bit majority WITHOUT 64 scalar aggregate columns (that plan's
    # whole-stage codegen alone cost seconds — the same pathology the
    # MinHash one-array signature fixed): each word emits its 64 ±1 votes
    # as one array, posexplode + two thin aggregations do the rest.
    # Shuffle volume is docs×64 tiny rows after map-side partial agg.
    votes = words.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), i -> CASE WHEN"
                " (shiftright(CASE WHEN i < 32 THEN lo ELSE hi END, i % 32) & 1) = 1"
                " THEN 1 ELSE -1 END)"
            )
        ).alias("pos", "v"),
    )
    bitsum = votes.groupBy("doc_id", "pos").agg(F.sum("v").alias("s"))
    return bitsum.groupBy("doc_id").agg(
        F.expr(
            "bit_or(shiftleft(CAST(CASE WHEN s > 0 THEN 1 ELSE 0 END AS BIGINT), pos))"
        ).alias("simhash")
    )
