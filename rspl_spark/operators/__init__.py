"""Reusable operator library (SURVEY.md §2.2): as-of joins, dedup,
similarity search, text analysis, multimodal column processing.

The oracle-gated queries in rspl_spark.queries are built on these.
"""
