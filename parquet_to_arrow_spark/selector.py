"""Per-chunk codec auto-selector.

A pure, deterministic function of chunk statistics → ranked codec candidates.
Mirrors (and generalizes) the reference's one-bit decision "does this column
chunk have a dictionary page?" (reference: src/parquet-to-arrow.cc:25-33) into
a size-model competition across all five lightweight codecs, with a final
*measured* guard: the encoder compares the actual payload against PLAIN and
falls back if the model was wrong (SURVEY.md §7.4: compare actual encoded
sizes, not just heuristics).
"""

from __future__ import annotations

from .codecs import bitpack, dictionary, for_, fsst, plain, rle

INT_CODECS = {
    plain.NAME: plain,
    bitpack.NAME: bitpack,
    for_.NAME: for_,
    rle.NAME: rle,
    dictionary.NAME: dictionary,
    fsst.NAME: fsst,
}

# Deterministic tie-break order (cheapest decode first).
_PRIORITY = [plain.NAME, bitpack.NAME, for_.NAME, rle.NAME, dictionary.NAME, fsst.NAME]


def rank_int_codecs(stats: dict) -> list[tuple[int, str]]:
    """Ranked (estimated_bytes, codec_name), best first; deterministic."""
    ranked = []
    for name in _PRIORITY:
        est = INT_CODECS[name].estimate(stats)
        ranked.append((est, name))
    ranked.sort(key=lambda t: (t[0], _PRIORITY.index(t[1])))
    return ranked


def select_int_codec(stats: dict) -> str:
    return rank_int_codecs(stats)[0][1]
