"""Query registry: every operator declared in SURVEY.md §2.2 gets a named
query (Spark implementation) and, where SQL-expressible, a DuckDB oracle.

The driver contract (``__spark_entry__.py``) exposes this registry via
``queries()`` / ``oracle_sql()``.

Determinism rules (SURVEY.md §2.2):
- every query ends with an explicit ORDER BY on a unique key;
- float aggregates are rounded in-query where accumulation order could
  differ between engines;
- output columns are aliased identically in Spark and SQL;
- integer-valued outputs are cast to BIGINT on both sides (DuckDB's
  sum(BIGINT) yields HUGEINT, Spark's year() yields INT — normalize both).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator registering a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags))
        return fn

    return deco


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (side effect: fills REGISTRY) and return it."""
    from rspl_spark.queries import (  # noqa: F401
        aggregation,
        behavior_queries,
        curation,
        dsl_queries,
        graph_queries,
        joins,
        llm_ops,
        pipeline_ops,
        relational,
        relational2,
        relational3,
        scale_queries,
        streaming_queries,
        timeseries_queries,
        tpch_partsupp,
        windows,
    )

    return REGISTRY
