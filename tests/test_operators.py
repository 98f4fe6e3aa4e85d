"""Ground-truth tests for the training-data operators: planted duplicates
must be found, ANN must agree with brute force on easy cases."""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_docs(spark, tmp_path_factory):
    """documents table with planted exact + near duplicates."""
    base = "the quick brown fox jumps over the lazy dog and runs far away "
    rows = [
        Row(doc_id=1, text=base * 8, lang="en", source="web", n_chars=len(base * 8)),
        Row(doc_id=2, text=base * 8, lang="en", source="web", n_chars=len(base * 8)),  # exact dup
        Row(doc_id=3, text=(base * 8)[:-10] + "different!", lang="en", source="web",
            n_chars=len(base * 8)),  # near dup
        Row(doc_id=4, text="completely unrelated content about spaceships and stars "
            "orbit gravity mission " * 6, lang="en", source="books", n_chars=10),
        Row(doc_id=5, text="short one", lang="en", source="forum", n_chars=9),
    ]
    d = tmp_path_factory.mktemp("planted")
    spark.createDataFrame(rows).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_exact_dedup_finds_planted_dup(spark, planted_docs):
    from parquet_to_arrow_spark.operators.dedup import exact_dedup_groups, exact_dedup_kept

    groups = {r["keep_id"]: r["n_copies"] for r in exact_dedup_groups(spark, planted_docs).collect()}
    assert groups[1] == 2  # doc 2 collapsed into doc 1
    kept = {r["doc_id"] for r in exact_dedup_kept(spark, planted_docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_minhash_lsh_finds_planted_near_dup(spark, planted_docs):
    from parquet_to_arrow_spark.operators.dedup import minhash_lsh_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(spark, planted_docs, threshold=0.5).collect()}
    assert pairs.get((1, 2)) == 1.0  # exact dup -> identical signatures
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup caught by banding
    assert (1, 4) not in pairs and (1, 5) not in pairs  # unrelated not paired


def test_minhash_recall_on_planted_corpus(spark, tmp_path_factory):
    """K=64 / 16-band x 4-row banding: planted near-dup pairs (char-shingle
    jaccard ~0.65) must be recovered at >= 80% recall from a noisy corpus,
    with no false pairs among unrelated docs."""
    import random

    from parquet_to_arrow_spark.operators.dedup import minhash_lsh_pairs

    rng = random.Random(42)
    vocab = [f"w{i:03d}" for i in range(400)]
    rows, planted, did = [], [], 0
    for p in range(12):
        a_words = rng.sample(vocab, 60)
        b_words = a_words[:48] + [f"x{p}{i:02d}" for i in range(12)]
        rows += [(did, " ".join(a_words)), (did + 1, " ".join(b_words))]
        planted.append((did, did + 1))
        did += 2
    for _ in range(30):  # background noise from the same vocabulary
        rows.append((did, " ".join(rng.sample(vocab, 60))))
        did += 1
    d = tmp_path_factory.mktemp("minhash_recall")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(d / "documents.parquet"))

    got = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, str(d), threshold=0.5).collect()
    }
    recall = len(got & set(planted)) / len(planted)
    assert recall >= 0.8, (recall, sorted(got))
    assert not (got - set(planted)), got - set(planted)  # no false pairs


def test_minhash_band_cap_bounds_skewed_join(spark, tmp_path_factory):
    """Mass-duplicated boilerplate (1000 identical docs — the classic
    pretraining-dedup skew) must NOT go quadratic in the band self-join:
    with band_cap=20 the surviving candidate set is C(20,2)=190 pairs, not
    the uncapped C(1000,2)=499500. Identical docs share every band value
    and the deterministic xxhash64(doc_id) ranking picks the same survivors
    in each, so the distinct-pair bound is exactly C(cap,2)."""
    from parquet_to_arrow_spark.operators.dedup import minhash_lsh_pairs

    text = "mass duplicated boilerplate paragraph that appears everywhere " * 4
    rows = [(i, text, "en", "web", len(text)) for i in range(1000)]
    d = tmp_path_factory.mktemp("minhash_cap")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))

    pairs = minhash_lsh_pairs(spark, str(d), threshold=0.5, band_cap=20).collect()
    assert 0 < len(pairs) <= 20 * 19 // 2
    assert all(r["est_jaccard"] == 1.0 for r in pairs)


def test_ngram_jaccard_scores_planted_pair(spark, planted_docs):
    from parquet_to_arrow_spark.operators.dedup import ngram_jaccard_pairs

    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs(spark, planted_docs, threshold=0.5, max_df=10).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert pairs.get((1, 3), 0) > 0.5


def test_simhash_near_dup_has_small_hamming(spark, planted_docs):
    from parquet_to_arrow_spark.operators.dedup import simhash64

    h = {r["doc_id"]: r["simhash"] for r in simhash64(spark, planted_docs).collect()}
    assert h[1] == h[2]
    near = bin((h[1] ^ h[3]) & ((1 << 64) - 1)).count("1")
    far = bin((h[1] ^ h[4]) & ((1 << 64) - 1)).count("1")
    assert near < far, (near, far)


def test_ann_lsh_subset_of_bruteforce_order(spark):
    from parquet_to_arrow_spark.operators.similarity import ann_lsh_topk, brute_force_topk

    bf = brute_force_topk(spark, SF, n_queries=3, k=10).collect()
    bf_rank = {(r["query_id"], r["neighbor_id"]): r["rank"] for r in bf}
    lsh = ann_lsh_topk(spark, SF, n_queries=3, k=10).collect()
    # every LSH hit that brute force also ranked must respect relative order
    for q in {r["query_id"] for r in lsh}:
        hits = [r for r in lsh if r["query_id"] == q]
        common = [r for r in hits if (q, r["neighbor_id"]) in bf_rank]
        bf_order = sorted(common, key=lambda r: bf_rank[(q, r["neighbor_id"])])
        assert [r["neighbor_id"] for r in bf_order] == [
            r["neighbor_id"] for r in sorted(common, key=lambda r: r["rank"])
        ]


def test_tfidf_top_terms_surfaces_distinctive_words(spark, planted_docs):
    from parquet_to_arrow_spark.operators.textstats import tfidf_top_terms

    top = {}
    for r in tfidf_top_terms(spark, planted_docs, k=3).collect():
        top.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score_r"]))
    assert set(top) == {1, 2, 3, 4, 5}
    for doc_id, terms in top.items():
        assert [t[0] for t in sorted(terms)] == list(range(1, len(terms) + 1))
        assert all(t[2] > 0 for t in terms)
    # doc 4 is the spaceship doc: its top terms are its own vocabulary,
    # disjoint from the fox docs' top terms
    fox_terms = {t[1] for t in top[1]}
    space_terms = {t[1] for t in top[4]}
    assert not (fox_terms & space_terms)


def test_lang_id_marks_english(spark, planted_docs):
    from parquet_to_arrow_spark.operators.textstats import lang_id

    got = {r["doc_id"]: r["lang_guess"] for r in lang_id(spark, planted_docs).collect()}
    assert got[1] == "en"
    assert got[5] == "unknown"  # no markers in "short one"


def test_asof_join_planted_timeline(spark, tmp_path):
    """As-of semantics on a hand-built timeline: latest click at-or-before
    each purchase, same-instant click counts, no click -> null."""
    import datetime as dt

    from parquet_to_arrow_spark.operators.relational import asof_purchase_last_click

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: click(1) buy(2) click(3) buy(4); same-instant click 5/buy 6
        (1, T(10), 1, "click"), (2, T(20), 1, "purchase"),
        (3, T(30), 1, "click"), (4, T(40), 1, "purchase"),
        (5, T(50), 1, "click"), (6, T(50), 1, "purchase"),
        # user 2: purchase with NO prior click
        (7, T(5), 2, "purchase"), (8, T(9), 2, "click"),
    ]
    d = tmp_path / "ev"
    spark.createDataFrame(
        [(e, ts, u, t, 0.0, "{}") for e, ts, u, t in rows],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r["event_id"]: (r["last_click_id"], r["gap_us"])
        for r in asof_purchase_last_click(spark, str(d)).collect()
    }
    assert got[2] == (1, 10_000_000)
    assert got[4] == (3, 10_000_000)
    assert got[6] == (5, 0)  # same-instant click counts as at-or-before
    assert got[7] == (None, None)


def test_contamination_screen_flags_probes(spark, planted_docs):
    from parquet_to_arrow_spark.operators.textstats import contamination_screen

    got = {
        r["doc_id"]: (r["n_probes_hit"], r["contaminated"])
        for r in contamination_screen(
            spark, planted_docs, probes=("quick brown fox", "spaceships", "absent-xyz")
        ).collect()
    }
    assert got[1] == (1, True) and got[2] == (1, True)  # fox docs
    assert got[4] == (1, True)  # spaceship doc
    assert got[5] == (0, False)  # "short one" hits nothing


def test_winnow_fingerprints_matches_pure_python(spark):
    """Operator vs an independent winnowing recompute (hashlib + sliding
    min), plus the winnowing guarantee on a planted shared substring."""
    import hashlib

    from parquet_to_arrow_spark.operators.textstats import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    sf = "/root/testdata/sf0.001"
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet(f"{sf}/documents.parquet").limit(50).collect()}
    out = {r["doc_id"]: r for r in winnow_fingerprints(spark, sf).collect()}

    def winnow(text: str) -> set[int]:
        n_h = max(len(text) - (WINNOW_K - 1), 1)
        hs = [
            int(hashlib.md5(text[i:i + WINNOW_K].encode()).hexdigest()[:8], 16)
            for i in range(n_h)
        ]
        n_w = max(n_h - (WINNOW_W - 1), 1)
        return {min(hs[j:j + WINNOW_W]) for j in range(n_w)}

    for doc_id, text in docs.items():
        fps = winnow(text)
        r = out[doc_id]
        assert (r["n_fp"], r["fp_min"], r["fp_max"], r["fp_sum"]) == (
            len(fps), min(fps), max(fps), sum(fps),
        )

    # guarantee: two docs sharing a >= w+k-1 char run share a fingerprint
    shared = "zqxwvutsrqponmlk"  # 16 chars >= 8+4-1
    assert winnow("AAA " + shared + " BBB") & winnow("CCCCC " + shared + " DD")


def test_repetition_stats_matches_pure_python(spark, planted_docs):
    """Operator vs an independent per-doc recompute, plus the planted
    expectation that the 8x-repeated doc is overwhelmingly duplicated
    3-grams while the short doc has none."""
    from parquet_to_arrow_spark.operators.textstats import repetition_stats

    texts = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(f"{planted_docs}/documents.parquet").collect()}
    out = {r["doc_id"]: r for r in repetition_stats(spark, planted_docs).collect()}

    for doc_id, text in texts.items():
        words = [w for w in text.split(" ") if w]
        r = out[doc_id]
        for k, name in ((1, "word"), (2, "2gram"), (3, "3gram")):
            grams = [" ".join(words[i:i + k]) for i in range(len(words) - k + 1)] \
                if len(words) >= k else []
            assert r[f"n_{name}s"] == len(grams)
            assert r[f"n_distinct_{name}s"] == len(set(grams))
            want = round((len(grams) - len(set(grams))) / len(grams), 6) if grams else None
            assert r[f"dup_{name}_frac"] == pytest.approx(want) if grams else r[f"dup_{name}_frac"] is None
    assert out[1]["dup_3gram_frac"] > 0.8   # 8x-repeated boilerplate
    assert out[5]["n_3grams"] == 0          # "short one" has two words


def test_duplicated_ngrams_census_and_boilerplate_frac(spark, planted_docs):
    """3-grams shared by the three planted near-identical docs must appear
    in the census, and those docs must carry a high boilerplate fraction
    while the unrelated doc carries zero."""
    from parquet_to_arrow_spark.operators.textstats import (
        doc_boilerplate_frac,
        duplicated_ngrams,
    )

    census = {r["gram"]: r["n_docs"] for r in duplicated_ngrams(spark, planted_docs).collect()}
    assert census.get("the quick brown") == 3  # docs 1, 2, 3
    assert all(n >= 3 for n in census.values())

    frac = {r["doc_id"]: r for r in doc_boilerplate_frac(spark, planted_docs).collect()}
    assert frac[1]["boilerplate_frac"] == 1.0  # every 3-gram shared with 2 & 3
    assert frac[2]["boilerplate_frac"] == 1.0
    assert frac[4]["n_common"] == 0 and frac[4]["boilerplate_frac"] == 0.0
    assert frac[5]["n_grams"] == 0 and frac[5]["boilerplate_frac"] is None


def test_pii_redact_planted(spark, tmp_path):
    """Planted emails / IPs / phone numbers are counted on the original text
    and redacted in order; clean text keeps everything else verbatim."""
    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import pii_redact

    rows = [
        Row(doc_id=1, text="mail bob.smith+x@corp.example.org now", lang="en",
            source="web", n_chars=1),
        Row(doc_id=2, text="from 10.0.0.1 to 192.168.255.254 end", lang="en",
            source="web", n_chars=1),
        Row(doc_id=3, text="call 555-123-4567 or (555) 123-4567", lang="en",
            source="web", n_chars=1),
        Row(doc_id=4, text="nothing sensitive here", lang="en", source="web",
            n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in pii_redact(spark, str(tmp_path)).collect()}

    assert (out[1]["n_email"], out[1]["clean_text"]) == (1, "mail <EMAIL> now")
    assert (out[2]["n_ipv4"], out[2]["clean_text"]) == (2, "from <IP> to <IP> end")
    assert (out[3]["n_phone"], out[3]["clean_text"]) == (2, "call <PHONE> or <PHONE>")
    r4 = out[4]
    assert (r4["n_email"], r4["n_ipv4"], r4["n_phone"]) == (0, 0, 0)
    assert r4["clean_text"] == "nothing sensitive here"


def test_label_centroids_planted_geometry(spark, tmp_path):
    """Two planted classes with hand-computable geometry: orthogonal unit
    vectors (centroid norm 1/sqrt(2)) vs identical vectors (centroid norm =
    vector norm — the collapse signature)."""
    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.similarity import label_centroids

    rows = [
        Row(vec_id=1, embedding=[1.0, 0.0], label=0),
        Row(vec_id=2, embedding=[0.0, 1.0], label=0),
        Row(vec_id=3, embedding=[2.0, 0.0], label=1),
        Row(vec_id=4, embedding=[2.0, 0.0], label=1),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{tmp_path}/embeddings.parquet")
    out = {r["label"]: r for r in label_centroids(spark, str(tmp_path)).collect()}

    assert out[0]["n_vecs"] == 2
    assert out[0]["avg_norm_r"] == pytest.approx(1.0)
    assert out[0]["centroid_norm_r"] == pytest.approx(round(2**-0.5, 6))
    assert out[1]["avg_norm_r"] == pytest.approx(2.0)
    assert out[1]["centroid_norm_r"] == pytest.approx(2.0)


def test_unigram_logprob_matches_pure_python(spark, tmp_path):
    """Exact per-doc average log-prob under the corpus unigram LM on a
    hand-checkable corpus; the common-word doc must outscore the rare-word
    doc."""
    import math

    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import unigram_logprob

    rows = [
        Row(doc_id=1, text="a a a a", lang="en", source="s", n_chars=1),
        Row(doc_id=2, text="a a b", lang="en", source="s", n_chars=1),
        Row(doc_id=3, text="rare", lang="en", source="s", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in unigram_logprob(spark, str(tmp_path)).collect()}

    counts = {"a": 6, "b": 1, "rare": 1}
    total = 8.0
    for doc_id, words in ((1, ["a"] * 4), (2, ["a", "a", "b"]), (3, ["rare"])):
        want = round(sum(math.log(counts[w] / total) for w in words) / len(words), 6)
        assert out[doc_id]["n_words"] == len(words)
        assert out[doc_id]["avg_logprob_r"] == pytest.approx(want, abs=1e-9)
    assert out[1]["avg_logprob_r"] > out[3]["avg_logprob_r"]


def test_source_kl_drift_zero_for_identical_distribution(spark, tmp_path):
    """A source distributed exactly like the corpus has KL 0; a skewed
    source is strictly positive, matching the hand-computed value."""
    import math

    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import source_kl_drift

    # both sources: 2x "x", 1x "y" -> each equals the corpus distribution
    rows = [
        Row(doc_id=1, text="x x y", lang="en", source="s1", n_chars=1),
        Row(doc_id=2, text="x x y", lang="en", source="s2", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/d1/documents.parquet")
    out = {r["source"]: r for r in source_kl_drift(spark, f"{tmp_path}/d1").collect()}
    assert out["s1"]["kl_r"] == 0.0 and out["s2"]["kl_r"] == 0.0

    rows = [
        Row(doc_id=1, text="x x x y", lang="en", source="even", n_chars=1),
        Row(doc_id=2, text="x y y y", lang="en", source="skew", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/d2/documents.parquet")
    out = {r["source"]: r for r in source_kl_drift(spark, f"{tmp_path}/d2").collect()}
    # corpus: x=4/8, y=4/8; 'skew': x=1/4, y=3/4
    want = round(0.25 * math.log(0.25 / 0.5) + 0.75 * math.log(0.75 / 0.5), 6)
    assert out["skew"]["kl_r"] == pytest.approx(want, abs=1e-9)
    assert out["skew"]["n_words"] == 4 and out["skew"]["n_distinct_words"] == 2
    assert out["even"]["kl_r"] > 0.0  # mirrored skew


def test_quality_filter_per_language_threshold(spark, tmp_path):
    """Each language gets its OWN p10 word-count threshold; a short doc
    survives in a short-doc language but the same length is pruned in a
    long-doc language."""
    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import quality_filter

    rows = (
        # 'short' lang: word counts 2..11 -> p10 threshold ~2.9
        [Row(doc_id=i, text=" ".join(["w"] * (2 + i)), lang="short", source="s",
             n_chars=1) for i in range(10)]
        # 'long' lang: word counts 100..109 -> threshold ~100.9
        + [Row(doc_id=100 + i, text=" ".join(["w"] * (100 + i)), lang="long",
               source="s", n_chars=1) for i in range(10)]
    )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    kept = {
        r["doc_id"]: r
        for r in quality_filter(spark, str(tmp_path), exact=True).collect()
    }

    assert 0 not in kept          # 2 words < short-lang threshold
    assert 5 in kept              # 7 words passes short-lang threshold
    assert 100 not in kept        # 100 words < long-lang threshold (100.9)
    assert 109 in kept
    assert kept[5]["thr"] != kept[109]["thr"]  # genuinely per-language

    # the library default (approx_percentile, bounded memory) keeps the
    # same per-language gate shape; thresholds are real elements so the
    # doomed extremes differ only at the interpolation boundary
    approx = {r["doc_id"]: r for r in quality_filter(spark, str(tmp_path)).collect()}
    assert 5 in approx and 109 in approx
    assert approx[5]["thr"] != approx[109]["thr"]


def test_event_funnel_requires_strict_ordering(spark, tmp_path):
    """A click BEFORE the first view must not advance the funnel; only
    stage events strictly after the previous stage count."""
    import datetime as dt

    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.relational import event_funnel

    t0 = dt.datetime(2024, 1, 1)
    s = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: view(1) -> click(2) -> purchase(3): converts
        Row(event_id=1, ts=s(1), user_id=1, event_type="view", value=0.0, props=""),
        Row(event_id=2, ts=s(2), user_id=1, event_type="click", value=0.0, props=""),
        Row(event_id=3, ts=s(3), user_id=1, event_type="purchase", value=0.0, props=""),
        # user 2: click(1) BEFORE view(2), purchase(3): click must not count
        Row(event_id=4, ts=s(1), user_id=2, event_type="click", value=0.0, props=""),
        Row(event_id=5, ts=s(2), user_id=2, event_type="view", value=0.0, props=""),
        Row(event_id=6, ts=s(3), user_id=2, event_type="purchase", value=0.0, props=""),
        # user 3: purchase before click: stops at click
        Row(event_id=7, ts=s(1), user_id=3, event_type="view", value=0.0, props=""),
        Row(event_id=8, ts=s(2), user_id=3, event_type="purchase", value=0.0, props=""),
        Row(event_id=9, ts=s(3), user_id=3, event_type="click", value=0.0, props=""),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {r["user_id"]: r for r in event_funnel(spark, str(tmp_path)).collect()}

    assert out[1]["converted"] is True
    assert out[2]["click_us"] is None and out[2]["converted"] is False
    assert out[3]["click_us"] is not None and out[3]["purchase_us"] is None


def test_retention_cohorts_planted_matrix(spark, tmp_path):
    """Hand-built two-cohort timeline: week-0 counts equal cohort sizes,
    retention drops exactly as planted, and users without a signup event
    never enter the matrix."""
    import datetime as dt

    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.relational import retention_cohorts

    base = dt.datetime(2024, 1, 4)  # mid-week; offsets in whole weeks
    w = lambda k: base + dt.timedelta(weeks=k)  # noqa: E731
    rows = [
        # cohort A (week 0): users 1, 2 sign up; user 1 active weeks 1 and 2
        Row(event_id=1, ts=w(0), user_id=1, event_type="signup", value=0.0, props=""),
        Row(event_id=2, ts=w(0), user_id=2, event_type="signup", value=0.0, props=""),
        Row(event_id=3, ts=w(1), user_id=1, event_type="click", value=0.0, props=""),
        Row(event_id=4, ts=w(2), user_id=1, event_type="view", value=0.0, props=""),
        # cohort B (week 1): user 3 signs up, active week 2
        Row(event_id=5, ts=w(1), user_id=3, event_type="signup", value=0.0, props=""),
        Row(event_id=6, ts=w(2), user_id=3, event_type="purchase", value=0.0, props=""),
        # user 4 never signs up: excluded entirely
        Row(event_id=7, ts=w(0), user_id=4, event_type="click", value=0.0, props=""),
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/events.parquet")
    out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(spark, str(tmp_path)).collect()}

    weeks = sorted({cw for cw, _ in out})
    a, b = weeks[0], weeks[1]
    assert b == a + 1
    assert out[(a, 0)] == 2 and out[(a, 1)] == 1 and out[(a, 2)] == 1
    assert out[(b, 0)] == 1 and out[(b, 1)] == 1
    assert sum(n for (cw, _), n in out.items() if cw not in (a, b)) == 0


def test_bigram_logprob_matches_pure_python(spark, tmp_path):
    """Exact per-doc average bigram log-prob on a hand-checkable corpus:
    the templated doc (repeating the dominant pair) outscores the
    word-salad doc whose UNIGRAMS are just as common; sub-two-word docs
    are excluded (no bigram defined)."""
    import math
    from collections import Counter

    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import bigram_logprob

    texts = {1: "a b a b a b", 2: "b a a a b b", 3: "solo"}
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=1)
        for i, t in texts.items()
    ]
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in bigram_logprob(spark, str(tmp_path)).collect()}

    def bigrams(t):
        ws = t.split()
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    corpus = Counter(bg for t in texts.values() for bg in bigrams(t))
    total = sum(corpus.values())
    assert 3 not in out  # single word: no bigram, excluded
    for i in (1, 2):
        bgs = bigrams(texts[i])
        want = sum(math.log(corpus[b] / total) for b in bgs) / len(bgs)
        assert out[i]["n_bigrams"] == len(bgs)
        assert abs(out[i]["avg_logprob_r"] - round(want, 6)) < 1e-6
    assert out[1]["avg_logprob_r"] > out[2]["avg_logprob_r"]


def test_quality_gate_report_counts(spark, tmp_path):
    """The report's kept counts equal the filter's survivors per language,
    and kept_frac is their ratio."""
    from pyspark.sql import Row

    from parquet_to_arrow_spark.operators.textstats import (
        quality_filter,
        quality_gate_report,
    )

    rows = (
        [Row(doc_id=i, text=" ".join(["w"] * (2 + i)), lang="short", source="s",
             n_chars=1) for i in range(10)]
        + [Row(doc_id=100 + i, text=" ".join(["w"] * (100 + i)), lang="long",
               source="s", n_chars=1) for i in range(10)]
    )
    spark.createDataFrame(rows).write.parquet(f"{tmp_path}/documents.parquet")
    rep = {r["lang"]: r for r in quality_gate_report(
        spark, str(tmp_path), exact=True).collect()}
    kept = quality_filter(spark, str(tmp_path), exact=True).collect()
    from collections import Counter

    per_lang = Counter(r["lang"] for r in kept)
    for lang in ("short", "long"):
        assert rep[lang]["n_docs"] == 10
        assert rep[lang]["n_kept"] == per_lang[lang]
        assert abs(rep[lang]["kept_frac"] - round(per_lang[lang] / 10, 6)) < 1e-9
