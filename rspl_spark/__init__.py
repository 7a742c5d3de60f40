"""rspl_spark — a PySpark-native analytics engine with the capabilities of
shtsoft/rspl (a coinductive stream-processor DSL), re-expressed Spark-first.

Layers:
- ``rspl_spark.session``   — SparkSession factory tuned for local[32] and scale.
- ``rspl_spark.catalog``   — testdata loaders / view registration.
- ``rspl_spark.dsl``       — the rspl language: Get/Put stream processors,
  combinators (map, filter, compose, alternate, bind, generate), a compiler
  lowering stateless terms to native DataFrame expressions, and a stateful
  interpreter running residual terms via applyInPandas.
- ``rspl_spark.operators`` — relational operator surface (joins, aggs,
  windows, set ops, as-of join, dedup, similarity, text analysis).
- ``rspl_spark.streaming`` — Structured Streaming sources/sinks and the
  keyed-FSM stateful template.
"""

from rspl_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
