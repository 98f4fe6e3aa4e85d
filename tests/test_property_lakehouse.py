"""Property-based tests (hypothesis) for the round-4 pure-python kernels:
Bloom filters never produce false negatives, BPE segmentation is lossless
for arbitrary words, and the trainer is a pure function of its input."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from parquet_to_arrow_spark.operators import tokenize as tk
from parquet_to_arrow_spark.sources.bloom_index import Bloom

keys = st.text(min_size=0, max_size=24)


@settings(max_examples=80, deadline=None)
@given(st.lists(keys, max_size=300), st.floats(min_value=0.001, max_value=0.2))
def test_bloom_never_false_negative(ks, fpp):
    b = Bloom.build(ks, fpp=fpp)
    b2 = Bloom.from_bytes(b.m_bits, b.k, b.to_bytes())  # serialization too
    assert all(b2.might_contain(k) for k in ks)


# words drawn from a small alphabet so merges actually fire
words = st.text(alphabet="abcde", min_size=1, max_size=12)


@settings(max_examples=60, deadline=None)
@given(st.dictionaries(words, st.integers(min_value=1, max_value=50), max_size=40),
       st.integers(min_value=0, max_value=30))
def test_bpe_apply_is_lossless_for_any_vocab(freqs, n_merges):
    merges = tk.bpe_train(dict(freqs), n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = tk.bpe_vocab(freqs, merges)
    for w in list(freqs)[:10]:
        pieces = tk._apply_word(w, ranks)
        assert "".join(pieces) == w + tk.END  # segmentation never loses bytes
        assert all(p in vocab for p in pieces)  # vocab covers training words


@settings(max_examples=30, deadline=None)
@given(st.dictionaries(words, st.integers(min_value=1, max_value=9), max_size=25))
def test_bpe_train_is_pure(freqs):
    assert tk.bpe_train(dict(freqs), 12) == tk.bpe_train(dict(freqs), 12)
