"""parquet_to_arrow_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the capabilities of CJWorkbench/parquet-to-arrow
(reference at /root/reference, v3.0.0) as an idiomatic PySpark engine:

- Columnar encode/decode with dictionary, RLE, frame-of-reference, bit-packing,
  and FSST codecs implemented as pure numpy kernels (``codecs/``), driven from
  Spark through Arrow-batched ``mapInArrow`` — never per-row Python.
- A per-chunk codec auto-selector (``selector.py``) that picks the winning codec
  from chunk statistics, the Spark-scale analogue of the reference's per-column
  dictionary-preservation probe (reference: src/parquet-to-arrow.cc:25-33).
- Strict round-trip verification with null-safe typed equality — the
  ``parquet-diff`` role (reference: src/parquet-diff.cc) — via join-based
  comparison (``verify.py``).
- Manifests, metrics, and checkpoint/resume (``manifest.py``, ``checkpoint.py``).
- Format sinks (CSV RFC-4180 / JSON array-of-objects) and scalar render
  functions mirroring parquet-to-text-stream (``functions/render.py``).
"""

__version__ = "0.1.0"
