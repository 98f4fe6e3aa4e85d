"""Lightweight-compression codec kernels (pure numpy, Spark-free).

Registry of the five codecs mandated by the north rule plus the PLAIN
fallback. Each module exposes ``NAME``, ``encode(values) -> (payload, meta)``,
``decode(payload, meta, n) -> values`` and ``estimate(stats) -> bytes``.
"""

from . import bitpack, dictionary, for_, fsst, plain, rle

ALL = {m.NAME: m for m in (plain, bitpack, for_, rle, dictionary, fsst)}

__all__ = ["plain", "bitpack", "for_", "rle", "dictionary", "fsst", "ALL"]
