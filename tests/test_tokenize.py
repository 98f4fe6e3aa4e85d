"""BPE tokenizer: trainer semantics (pure python, no Spark), distributed
application, and the driver-query summary."""

from __future__ import annotations

from parquet_to_arrow_spark.operators import tokenize as tk


class TestTrainer:
    def test_classic_merge_order(self):
        # the Sennrich toy corpus: the est</w> suffix (count 9) dominates
        # the first merges; ties (es/st/t</w> all 9) break lexicographically
        # max, so the suffix builds right-to-left — pinned for determinism
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = tk.bpe_train(freqs, 4)
        assert merges[0] == ("t", tk.END)
        assert merges[1] == ("s", "t" + tk.END)
        assert merges[2] == ("e", "st" + tk.END)
        assert len(merges) == 4

    def test_deterministic_and_tie_stable(self):
        freqs = {"ab": 3, "ba": 3, "cc": 3}
        assert tk.bpe_train(dict(freqs), 5) == tk.bpe_train(dict(freqs), 5)

    def test_apply_reconstructs_word(self):
        freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        merges = tk.bpe_train(freqs, 6)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in list(freqs) + ["lowest", "newer"]:
            pieces = tk._apply_word(w, ranks)
            assert "".join(pieces) == w + tk.END  # lossless segmentation

    def test_apply_matches_training_segmentation(self):
        # applying the merge table to a TRAINING word reproduces the
        # symbols the trainer ended with (greedy rank order == train order)
        freqs = {"newest": 6, "widest": 3}
        merges = tk.bpe_train(freqs, 3)
        ranks = {p: i for i, p in enumerate(merges)}
        got = tk._apply_word("newest", ranks)
        assert "est" + tk.END in got or "est" in got

    def test_vocab_covers_all_pieces(self):
        freqs = {"aaab": 4, "abab": 2}
        merges = tk.bpe_train(freqs, 4)
        vocab = tk.bpe_vocab(freqs, merges)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in freqs:
            assert all(p in vocab for p in tk._apply_word(w, ranks))
        assert vocab[tk.UNK] == 0


class TestDistributedApply:
    def test_encode_documents_deterministic_and_lossless(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        freqs = tk.sample_word_freqs(spark, docs)
        merges = tk.bpe_train(freqs, 60)
        vocab = tk.bpe_vocab(freqs, merges)
        enc = tk.bpe_encode(spark, docs, merges, vocab).cache()
        assert enc.count() == docs.count()
        # training docs contain no unseen characters -> zero OOV
        assert enc.agg({"n_unk": "sum"}).first()[0] == 0
        # lossless: pieces re-join to the original text's words
        id2p = {i: p for p, i in vocab.items()}
        row = (
            enc.join(docs.select("doc_id", "text"), "doc_id")
            .orderBy("doc_id")
            .first()
        )
        joined = "".join(id2p[t] for t in row["tokens"]).replace(tk.END, " ")
        assert joined.strip() == " ".join(row["text"].split())
        # deterministic under re-run (sample, trainer, apply all stable)
        enc2 = tk.bpe_encode(spark, docs, merges, vocab)
        a = {(r["doc_id"], tuple(r["tokens"])) for r in enc.collect()}
        b = {(r["doc_id"], tuple(r["tokens"])) for r in enc2.collect()}
        assert a == b

    def test_driver_summary_shape(self, spark):
        out = tk.bpe_encode_documents(spark, "/root/testdata/sf0.001", n_merges=40)
        rows = out.collect()
        assert len(rows) == 500
        assert all(r["n_tok"] > 0 and r["n_unk"] == 0 for r in rows)
        assert all(r["pieces_head"] for r in rows)


def test_sample_word_freqs_samples_large_int_keyed_corpus(spark):
    """The md5-bucket sampling branch (corpus > max_docs) must work on the
    int64-doc_id documents table — regression for a missing string cast
    that only fired past 4096 docs."""
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    assert docs.count() > 300
    freqs = tk.sample_word_freqs(spark, docs, max_docs=300)
    assert freqs and sum(freqs.values()) > 0


def test_bpe_roundtrip_equals_normalized_text(spark):
    """detokenize(tokenize(x)) == whitespace-normalized x for every doc —
    the tokenizer's lossless contract, the same decoded-values-identical
    rule the codec pipeline lives under."""
    from pyspark.sql import functions as F

    got = tk.bpe_roundtrip_documents(spark, "/root/testdata/sf0.001", n_merges=60)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("text"),
    )
    assert got.exceptAll(docs).count() == 0 and docs.exceptAll(got).count() == 0
