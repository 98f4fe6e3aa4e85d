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

    Scale shape (round-6 restructure, guide §4.2): candidate pairs are NEVER
    materialized as rows. The signature array rides on the band rows through
    the window cap's one exchange; a mapInArrow over the window's
    (band, tiebreak)-sorted output verifies each bucket as a vectorized
    numpy block (k x 64 slot matrix -> pairwise match counts) and emits only
    the >= threshold survivors. The previous plan enumerated every in-bucket
    pair as a JVM row and re-attached signatures via two shuffle joins — but
    bucket pairs grow quadratically (measured sf1.0: 24.0M bucket-pairs from
    50k docs, 3,273 survivors, hottest bucket 3,153 docs), so it shuffled
    and interpreter-evaluated (zip_with is CodegenFallback) ~7,000x more
    rows than survive. Pair semantics are unchanged: same capped buckets,
    same i<j in-bucket pairs, est = matches/64.0 (exact: integer / 2^6 in
    float64 on both paths), same >= threshold filter, dedup after the filter
    instead of before (est_jaccard is a pure function of the pair, so the
    surviving rows are identical). Shuffle cost is N_BANDS x sig_bytes x
    n_docs regardless of duplication; the verify pass is output-bounded.

    Skew guard: at most ``band_cap`` docs survive per band value before
    verification (deterministic row_number, overflow OBSERVED via
    'minhash_band_overflow' — the cap_buckets pattern from similarity.py).
    A corpus with mass-duplicated boilerplate puts millions of docs into one
    band; without the cap that band's pair count is quadratic. Capped docs
    in an over-full band are exact/near-exact duplicates of the survivors,
    which exact_dedup (or a keep-one pass over the survivors) already
    handles — the cap costs recall only for the pathological band, bounded
    and measured, instead of an unbounded join. The cap also bounds the
    verify pass's per-group memory (band_cap^2/2 pairs).
    """
    sig = minhash_signatures(spark, sf_dir, docs=docs).cache()
    rows_per_band = N_MINHASH // N_BANDS
    # The signature crosses the band shuffle AND the Python boundary as ONE
    # 512-byte binary blob, not array<long>: Spark's row<->Arrow bridge
    # converts array elements one at a time (the engine's core invariant —
    # see sources/io.py), and at N_BANDS x n_docs x 64 elements that
    # per-element walk dominated the verify stage. The blob is the 64
    # big-endian int64 slots; banding hashes 32-byte SLICES of it, so the
    # bucket invariant is unchanged (equal 4-slot slices <=> equal bytes =>
    # equal band hash). The pack runs once per doc (interpreted fold over
    # 64 doc-sized elements), not once per band row.
    sigbin = F.expr(
        "aggregate(sig, cast('' as binary), "
        "(acc, x) -> concat(acc, unhex(lpad(hex(x), 16, '0'))))"
    )
    packed = sig.select("doc_id", sigbin.alias("sigbin"))
    band_cols = [
        F.xxhash64(
            F.expr(f"substring(sigbin, {b * rows_per_band * 8 + 1}, {rows_per_band * 8})"),
            F.lit(b),
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    bands = packed.select("doc_id", "sigbin", *band_cols).select(
        "doc_id",
        F.col("sigbin").alias("sig"),
        F.explode(F.array(*[F.col(f"band{b}") for b in range(N_BANDS)])).alias("band"),
    )
    w = Window.partitionBy("band").orderBy(F.xxhash64(F.col("doc_id")))
    ranked = bands.withColumn("__rk", F.row_number().over(w)).observe(
        "minhash_band_overflow",
        F.sum((F.col("__rk") > band_cap).cast("long")).alias("overflow_rows"),
        F.count(F.lit(1)).alias("total_rows"),
    )
    capped = ranked.filter(F.col("__rk") <= band_cap).select("band", "doc_id", "sig")
    id_type = dict(capped.dtypes)["doc_id"]
    thr = float(threshold)
    k_sig = N_MINHASH

    def verify(batches):
        """Buffer the task's rows (the band-window just sorted them, so the
        partition already fit in one task), then verify buckets VECTORIZED
        BY SIZE CLASS: all size-k buckets stack into one (g, k, 64) tensor
        and the 64-slot match loop runs once per DISTINCT SIZE — not once
        per bucket. The per-bucket form cost ~200 us of numpy-call overhead
        x ~10^5 buckets (21.9 s single-thread at sf1.0, the whole stage);
        the class form is ~60 tensor passes total. Buckets above
        _BIG_GROUP docs take the duplicate-collapse path (byte-identical
        signature rows merge into classes; doc pairs expand only for
        qualifying class pairs, output-bounded)."""
        import numpy as np
        import pyarrow as pa

        _BIG_GROUP = 256
        bands_l: list = []
        docs_l: list = []
        sigs_l: list = []
        out_type = None

        def run_big(d, S):
            # duplicate-collapse for hot buckets (sf1.0: a 3,153-doc bucket
            # holds few DISTINCT signatures): match matrix over u classes,
            # intra-class pairs have matches == 64 by construction
            order = np.argsort(d, kind="stable")
            d, S = d[order], S[order]
            rows = np.ascontiguousarray(S).view([("", S.dtype)] * k_sig).ravel()
            uniq, inv = np.unique(rows, return_inverse=True)
            u = len(uniq)
            U = uniq.view(S.dtype).reshape(u, k_sig)
            m = np.zeros((u, u), dtype=np.int16)
            for s in range(k_sig):
                col = U[:, s]
                m += col[:, None] == col[None, :]
            est_uu = m / float(k_sig)
            by_class = np.argsort(inv, kind="stable")
            counts = np.bincount(inv, minlength=u)
            starts = np.zeros(u + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            members = [d[by_class[starts[c] : starts[c + 1]]] for c in range(u)]
            out = []
            if 1.0 >= thr:
                for c in range(u):
                    g = counts[c]
                    if g < 2:
                        continue
                    iu, ju = np.triu_indices(g, 1)
                    out.append(
                        (members[c][iu], members[c][ju], np.full(len(iu), 1.0))
                    )
            qual = est_uu >= thr
            np.fill_diagonal(qual, False)
            for c1, c2 in zip(*np.nonzero(np.triu(qual, 1))):
                A = members[c1][:, None]
                B = members[c2][None, :]
                out.append(
                    (
                        np.minimum(A, B).ravel(),
                        np.maximum(A, B).ravel(),
                        np.full(counts[c1] * counts[c2], est_uu[c1, c2]),
                    )
                )
            return out

        for batch in batches:
            if batch.num_rows == 0:
                continue
            out_type = batch.column(1).type
            bands_l.append(batch.column(0).to_numpy(zero_copy_only=False))
            docs_l.append(batch.column(1).to_numpy(zero_copy_only=False))
            # sig is one 512-byte blob per row (64 big-endian int64 slots);
            # only slot EQUALITY matters downstream, which is byte-order-
            # invariant — view the contiguous Arrow data buffer directly
            sb = batch.column(2).cast(pa.large_binary())
            bufs = sb.buffers()
            off = np.frombuffer(
                bufs[1], dtype=np.int64, count=len(sb) + 1, offset=sb.offset * 8
            )
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            sigs_l.append(
                data[off[0] : off[-1]].view(">i8").reshape(batch.num_rows, k_sig)
            )
        if not bands_l:
            return
        band = np.concatenate(bands_l)
        doc = np.concatenate(docs_l)
        # ONE byteswap pass to native int64: numpy ufuncs on a big-endian
        # view re-swap on every operation, which re-serialized the whole
        # match loop (slot values change representation, not identity —
        # only equality is consumed downstream)
        sigs = np.concatenate(sigs_l).astype(np.int64)
        # the window delivers rows sorted by band; verify that with one
        # cheap pass and re-sort ONLY if the assumption ever breaks (the
        # unconditional argsort + three full-array gathers measurably cost
        # more than the whole match loop)
        if len(band) > 1 and not np.all(band[1:] >= band[:-1]):
            order = np.argsort(band, kind="stable")
            band, doc, sigs = band[order], doc[order], sigs[order]
        change = np.flatnonzero(band[1:] != band[:-1])
        bounds = np.concatenate(([0], change + 1, [len(band)]))
        sizes = np.diff(bounds)
        out = []
        for k in np.unique(sizes):
            k = int(k)
            if k < 2:
                continue
            gsel = np.flatnonzero(sizes == k)
            if k > _BIG_GROUP:
                for gi in gsel:
                    lo = bounds[gi]
                    out.extend(run_big(doc[lo : lo + k], sigs[lo : lo + k]))
                continue
            # all size-k buckets as one (g, k, 64) tensor, processed in
            # chunks whose int8 match accumulator fits in cache: the slot
            # loop sweeps the accumulator 64 times, so an out-of-cache m
            # turns into ~12 GB of memory traffic on this membound box
            # (counts <= 64 fit int8; slot-major transpose makes each
            # sweep's reads contiguous)
            idx = (bounds[gsel][:, None] + np.arange(k)[None, :]).ravel()
            D = doc[idx].reshape(len(gsel), k)
            G = sigs[idx].reshape(len(gsel), k, k_sig)
            ds = np.argsort(D, axis=1, kind="stable")
            D = np.take_along_axis(D, ds, axis=1)
            G = np.ascontiguousarray(
                np.take_along_axis(G, ds[:, :, None], axis=1).transpose(0, 2, 1)
            )  # (g, 64, k) slot-major
            iu, ju = np.triu_indices(k, 1)
            chunk = max(1, (1 << 20) // (k * k))
            for c0 in range(0, len(gsel), chunk):
                Gc = G[c0 : c0 + chunk]
                gc = len(Gc)
                m = np.zeros((gc, k, k), dtype=np.int8)
                for s in range(k_sig):
                    col = Gc[:, s, :]
                    m += col[:, :, None] == col[:, None, :]
                est = m[:, iu, ju] / float(k_sig)
                keep = est >= thr
                if keep.any():
                    Dc = D[c0 : c0 + chunk]
                    out.append(
                        (
                            np.broadcast_to(Dc[:, iu], keep.shape)[keep],
                            np.broadcast_to(Dc[:, ju], keep.shape)[keep],
                            est[keep],
                        )
                    )
        if out:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate([g[0] for g in out])).cast(out_type),
                    pa.array(np.concatenate([g[1] for g in out])).cast(out_type),
                    pa.array(
                        np.concatenate([g[2] for g in out]), type=pa.float64()
                    ),
                ],
                names=["doc_a", "doc_b", "est_jaccard"],
            )

    pairs = capped.mapInArrow(
        verify, f"doc_a {id_type}, doc_b {id_type}, est_jaccard double"
    )
    return pairs.dropDuplicates(["doc_a", "doc_b"])


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
    """64-bit SimHash per doc: word-level md5 hashes, per-bit majority vote.

    The word hash is the two 32-bit halves of md5(word) (bits 0-31 from hex
    chars 9-16, bits 32-63 from chars 1-8): md5 is available in every SQL
    engine, so the whole operator has an exact DuckDB oracle twin (xxhash64
    does not exist in DuckDB and would leave this rows-only-checked).

    Round-6 restructure (guide §4.2): the previous JVM pipeline emitted 64
    ±1-vote rows PER WORD (posexplode) and reduced them with two hash
    aggregations — at sf1.0 that is ~210M exploded rows shuffled into a
    (doc, bit) aggregate for 50k output rows. Now a zero-shuffle mapInArrow
    computes the whole vote matrix vectorized per batch: words split with
    pyarrow (C speed), md5 evaluated ONCE PER DISTINCT WORD per batch
    (dictionary_encode collapses the ~10x word repetition), bit unpack +
    per-doc majority as numpy matrix ops. Semantics are bit-identical: same
    single-space split, same empty-token filter (docs with no words emit no
    row), same md5 halves, ties (s==0) -> 0, bit 63 sign via uint64 view.
    Shuffle volume: ZERO (was: words x 64 partial-agg rows)."""
    docs = _spread(_docs(spark, sf_dir)).select("doc_id", "text")

    def run(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        shifts = np.arange(64, dtype=np.uint64)
        weights = np.uint64(1) << shifts

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            doc_id = batch.column(0)
            words = pc.split_pattern(batch.column(1), " ")
            flat = words.flatten()
            # per-doc word counts (null text -> 0 words, like explode(null))
            wlen = pc.list_value_length(words)
            wlen = pc.fill_null(wlen, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            nonempty = pc.not_equal(pc.utf8_length(flat), 0)
            mask = nonempty.to_numpy(zero_copy_only=False).astype(bool)
            # counts of surviving words per doc (safe for zero-word docs)
            cs = np.zeros(len(mask) + 1, dtype=np.int64)
            np.cumsum(mask, out=cs[1:])
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(wlen, out=off[1:])
            counts = cs[off[1:]] - cs[off[:-1]]
            kept = flat.filter(nonempty)
            if len(kept) == 0:
                continue
            denc = pc.dictionary_encode(kept)
            if isinstance(denc, pa.ChunkedArray):  # pragma: no cover
                denc = denc.combine_chunks()
            vocab = denc.dictionary.to_pylist()
            idx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            w64 = np.empty(len(vocab), dtype=np.uint64)
            for i, w in enumerate(vocab):
                d = hashlib.md5(w.encode("utf-8")).digest()
                w64[i] = (int.from_bytes(d[:4], "big") << 32) | int.from_bytes(
                    d[4:8], "big"
                )
            # hi half occupies bits 32-63, lo half bits 0-31 (bit i of this
            # uint64 == the JVM pipeline's vote source for simhash bit i)
            occ = w64[idx]
            bits = ((occ[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
            have = counts > 0
            # doc i's surviving words are rows [cs[off[i]], cs[off[i]]+counts[i])
            starts = cs[off[:-1]][have]
            ones = np.add.reduceat(bits, starts, axis=0)
            # majority: bit set iff ones > words/2  (s = 2*ones - words > 0)
            maj = (2 * ones) > counts[have][:, None]
            sim = (maj.astype(np.uint64) * weights[None, :]).sum(
                axis=1, dtype=np.uint64
            ).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [doc_id.filter(pa.array(have)), pa.array(sim, type=pa.int64())],
                names=["doc_id", "simhash"],
            )

    id_type = dict(docs.dtypes)["doc_id"]
    return docs.mapInArrow(run, f"doc_id {id_type}, simhash long")
