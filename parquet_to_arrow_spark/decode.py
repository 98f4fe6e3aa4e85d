"""Decode job: encoded-chunks DataFrame -> tokens DataFrame.

Thin facade over encode.py's inverse kernels (kept one-module for cohesion);
import from here in pipelines: ``from parquet_to_arrow_spark.decode import
decode_chunks_df``.
"""

from .encode import decode_chunk_row, decode_chunks_df  # noqa: F401

__all__ = ["decode_chunk_row", "decode_chunks_df"]
