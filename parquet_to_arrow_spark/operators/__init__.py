"""Relational + training-data operators re-expressed Spark-first.

Each module hosts (spark, sf_dir) -> DataFrame query builders used by the
driver contract in __spark_entry__.py, mirroring SURVEY.md §2's inventory:
scans, projections, row slices, diff-compare, aggregation stats, windows,
sorts/limits, set ops (relational.py), plus the training-data pipeline ops:
dedup.py, similarity.py, textstats.py, multimodal.py.
"""
