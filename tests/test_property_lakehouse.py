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


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=2**20),  # dense low range
            st.integers(min_value=0, max_value=2**63 - 1),  # full 64-bit
        ),
        max_size=400,
    )
)
def test_roaring64_roundtrip_any_positions(positions):
    """Portable 64-bit Roaring + DV blob framing round-trip for arbitrary
    position sets — container boundaries, multi-key maps, duplicates."""
    from parquet_to_arrow_spark.sources import puffin as pf

    want = sorted(set(positions))
    assert pf.read_roaring64(pf.roaring64_bytes(positions)).tolist() == want
    assert pf.read_dv_blob(pf.dv_blob_bytes(positions)).tolist() == want


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=4090, max_value=4102),  # straddle DEFAULT_MAX_SIZE
    st.integers(min_value=0, max_value=3),
)
def test_roaring_array_bitmap_threshold(n, stride_sel):
    """Cardinalities around 4096 round-trip through whichever container
    encoding the spec mandates."""
    from parquet_to_arrow_spark.sources import puffin as pf

    stride = [1, 2, 3, 16][stride_sel]
    vals = list(range(0, n * stride, stride))[:n]
    assert pf.read_roaring64(pf.roaring64_bytes(vals)).tolist() == vals
