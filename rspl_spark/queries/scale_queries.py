"""Scale-pattern gate queries: the skew-mitigation rewrites and the
bucketed co-located join, each hash-checked against the PLAIN formulation
in DuckDB — the oracle's job here is to prove the physical rewrite
(salt, two-phase distinct, bucketing) is invisible in the result.

Spark ops: rspl_spark.operators.skew, rspl_spark.catalog.ensure_bucketed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import ensure_bucketed, load
from rspl_spark.operators.skew import salted_join, skew_safe_count_distinct
from rspl_spark.queries import query

# ---------------------------------------------------------------------------
# Salted replicated join: lineitem (fact) ⋈ supplier (dim) on suppkey with
# the fact side salted 8 ways and the dim side replicated. Oracle = the
# plain equi-join — identical output proves the salt never leaks.
# ---------------------------------------------------------------------------

_SALTED_ORACLE = """
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
ORDER BY s_nationkey
"""


@query("q_salted_join", oracle=_SALTED_ORACLE, tags=("scale", "join"))
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    fact = load(spark, sf_dir, "lineitem").select("l_suppkey", "l_quantity")
    dim = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    return (
        salted_join(fact, dim, "l_suppkey", n_salts=8)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("s_nationkey")
    )


# ---------------------------------------------------------------------------
# Skew-safe exact COUNT(DISTINCT): two uniform shuffles instead of one
# reducer per hot key. Oracle = the plain COUNT(DISTINCT).
# ---------------------------------------------------------------------------

_SKEW_CD_ORACLE = """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_distinct
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_skew_count_distinct", oracle=_SKEW_CD_ORACLE, tags=("scale", "agg"))
def q_skew_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return skew_safe_count_distinct(li, ["l_returnflag"], "l_suppkey").orderBy(
        "l_returnflag"
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: lineitem and orders CTAS'd into the warehouse
# bucketed+sorted on orderkey, then joined with ZERO join-side Exchange
# (asserted in tests/test_scale_patterns.py). Oracle = the same join on
# the raw parquet — bucketing is pure physical layout.
# ---------------------------------------------------------------------------

_BUCKETED_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_bucketed_join", oracle=_BUCKETED_ORACLE, tags=("scale", "join"))
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.table(ensure_bucketed(spark, sf_dir, "lineitem", "l_orderkey"))
    od = spark.table(ensure_bucketed(spark, sf_dir, "orders", "o_orderkey"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").cast("long").alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )
