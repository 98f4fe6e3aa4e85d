"""Text analysis over the documents table: language-ID heuristic, quality
scoring, token counting, fingerprinting.

Everything stays JVM-side (built-in string functions inside whole-stage
codegen) — no Python in the hot path — and every output is either integer,
string, or a deterministically-rounded double so the DuckDB oracle hashes
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _occurrences(col, needle: str):
    """Occurrence count via length arithmetic — identical semantics in Spark
    and DuckDB (no regex dialect risk)."""
    return (F.length(col) - F.length(F.replace(col, F.lit(needle)))) / len(needle)


# language marker words; ASCII-safe, shared verbatim with the oracle SQL
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " les "],
    "es": [" el ", " y ", " los "],
}


def lang_scores(col):
    return {
        lang: sum(_occurrences(col, m) for m in markers).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(spark, sf_dir) -> DataFrame:
    """N-gram/stopword-count language guess with a fixed tie-break order."""
    df = _docs(spark, sf_dir)
    scores = lang_scores(F.col("text"))
    best = F.lit("unknown")
    best_score = F.lit(0).cast("long")
    # fixed iteration order => deterministic argmax (strictly-greater wins)
    for lang in ("en", "de", "fr", "es"):
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return df.select(
        F.col("doc_id"),
        best.alias("lang_guess"),
        best_score.alias("lang_score"),
    )


def text_quality(spark, sf_dir) -> DataFrame:
    """Length / word / punctuation / stopword counts — the quality-scoring
    signals of a training-data pipeline, all integer-valued."""
    df = _docs(spark, sf_dir)
    text = F.col("text")
    n_words = (F.length(text) - F.length(F.replace(text, F.lit(" ")))) + 1
    n_punct = (
        F.length(text) - F.length(F.regexp_replace(text, F.lit(r"[.,!?;:]"), F.lit("")))
    ).cast("long")
    n_stop = (
        _occurrences(text, " the ") + _occurrences(text, " and ") + _occurrences(text, " a ")
    ).cast("long")
    return df.select(
        "doc_id",
        F.length(text).cast("long").alias("n_chars_measured"),
        n_words.cast("long").alias("n_words"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        (F.length(text) == F.col("n_chars")).alias("len_matches_meta"),
    )


def token_counts(spark, sf_dir) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens (letter runs / digit runs /
    single non-space symbol) — counted JVM-side with regexp_count."""
    df = _docs(spark, sf_dir)
    text = F.col("text")
    return df.select(
        "doc_id",
        (F.length(text) - F.length(F.replace(text, F.lit(" ")))).cast("long").alias("n_ws"),
        F.regexp_count(text, F.lit("[A-Za-z]+")).cast("long").alias("n_alpha_runs"),
        F.regexp_count(text, F.lit("[0-9]+")).cast("long").alias("n_digit_runs"),
        F.regexp_count(text, F.lit("[^A-Za-z0-9 ]")).cast("long").alias("n_symbols"),
    )


def fingerprints(spark, sf_dir) -> DataFrame:
    """Content fingerprints: md5 of the raw UTF-8 (engine-independent) plus a
    16-char prefix bucket — the exact-dedup key."""
    df = _docs(spark, sf_dir)
    return df.select(
        "doc_id",
        F.md5(F.encode(F.col("text"), "UTF-8")).alias("fp_md5"),
        F.substring(F.col("text"), 1, 16).alias("prefix16"),
    )


def tfidf_top_terms(spark, sf_dir, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document — the ranking primitive of a
    training-data quality/topic pipeline.

    Scale shape: one explode, one (doc, word) aggregation, one small join
    on the word dimension (document frequencies — vocabulary-sized, Spark
    broadcasts it), one per-doc window. idf = ln((N+1)/(df+1)) + 1 (smooth;
    always positive), score = tf * idf, ties broken by term ascending so the
    ranking is fully deterministic and oracle-checkable."""
    from .dedup import _spread

    docs = _docs(spark, sf_dir)
    n_docs = docs.count()  # driver-side scalar; one cheap metadata-ish job
    words = (
        _spread(docs)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") > 0)
    )
    tf = words.groupBy("doc_id", "w").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)) + 1.0
    scored = tf.join(dfreq, "w").withColumn(
        "score", F.col("tf").cast("double") * idf
    )
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("w"))
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("doc_id", F.col("w").alias("term"), "rank", F.round("score", 6).alias("score_r"))
    )


# fixed probe set shared verbatim with the oracle SQL; real pipelines pass
# their eval-set shingles here
CONTAMINATION_PROBES = (" the quick ", "lorem ipsum", " and ", "zzyzx-never-present")


def contamination_screen(spark, sf_dir, probes: tuple = CONTAMINATION_PROBES) -> DataFrame:
    """Test-set decontamination: per document, which probe n-grams occur.

    The decontamination shape at 100 TB: the probe set (eval-set shingles)
    is a SMALL broadcast side; containment is substring search inside
    whole-stage codegen — one scan of the corpus, zero shuffles, no Python.
    Output: one row per doc with the hit count and flag (join back on
    doc_id to drop contaminated docs)."""
    docs = _docs(spark, sf_dir)
    hits = sum(
        F.when(F.contains(F.col("text"), F.lit(p)), 1).otherwise(0) for p in probes
    )
    return docs.select(
        "doc_id",
        hits.cast("int").alias("n_probes_hit"),
        (hits > 0).alias("contaminated"),
    )


# winnowing parameters: k-gram length and window size (Schleimer/Wilkerson/
# Aiken, SIGMOD 2003 — the MOSS fingerprint selection)
WINNOW_K = 8
WINNOW_W = 4


def winnow_fingerprints(spark, sf_dir) -> DataFrame:
    """Winnowing document fingerprints: hash every char k-gram (rolling
    window of the text), then keep the MINIMUM hash of each w-hash window —
    the classic position-robust fingerprint set (an insertion shifts
    positions but local minima survive). Guarantee: any match of length
    >= w + k - 1 shares a fingerprint.

    Entirely JVM-side array expressions inside one projection — no explode,
    no shuffle, no Python: the per-doc fingerprint SET is reduced to scalar
    aggregates (count / min / max / sum of distinct selected hashes) so the
    result hashes identically in the DuckDB twin. The hash is the unsigned
    hi half of md5(k-gram) (dedup._md5_signed64's trick), bounded < 2^32 so
    the per-doc sum can never overflow a signed 64-bit."""
    text = F.col("text")
    n_h = F.greatest(F.length(text) - (WINNOW_K - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_h),
        lambda i: F.conv(
            F.substring(F.md5(F.substr(text, i, F.lit(WINNOW_K))), 1, 8), 16, 10
        ).cast("long"),
    )
    n_w = F.greatest(n_h - (WINNOW_W - 1), F.lit(1))
    with_hs = _docs(spark, sf_dir).select("doc_id", hs.alias("__hs"), n_w.alias("__nw"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("__nw")),
            lambda j: F.array_min(F.slice("__hs", j, WINNOW_W)),
        )
    )
    return with_hs.select(
        "doc_id",
        F.size(fps).alias("n_fp"),
        F.array_min(fps).alias("fp_min"),
        F.array_max(fps).alias("fp_max"),
        F.aggregate(fps, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("fp_sum"),
    )
