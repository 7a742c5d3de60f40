"""Window-function queries (SURVEY.md §2.2 "Window functions"): ranking,
analytic (lag/lead), aggregate-over-window with ROWS and RANGE frames,
running totals, moving averages, top-k per group.

Scale: a window = one shuffle on partitionBy keys + per-partition sort.
Partition keys here (c_mktsegment, o_custkey, user_id) have enough
cardinality to spread; a window WITHOUT partitionBy forces a single-task
global sort and is never used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.queries import query

# Ranking functions. rank/dense_rank/percent_rank order by a value with real
# ties (the 500-wide balance bucket); row_number/ntile get a unique ordering
# so every function is deterministic.

_RANK_ORACLE = """
SELECT c_custkey, c_mktsegment,
       CAST(FLOOR(c_acctbal / 500) AS BIGINT) AS bal_bucket,
       ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                          ORDER BY FLOOR(c_acctbal / 500) DESC, c_custkey) AS rn,
       RANK() OVER (PARTITION BY c_mktsegment
                    ORDER BY FLOOR(c_acctbal / 500) DESC) AS rnk,
       DENSE_RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY FLOOR(c_acctbal / 500) DESC) AS drnk,
       NTILE(4) OVER (PARTITION BY c_mktsegment
                      ORDER BY FLOOR(c_acctbal / 500) DESC, c_custkey) AS quartile,
       ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                  ORDER BY FLOOR(c_acctbal / 500) DESC), 6) AS pct_rnk
FROM customer
ORDER BY c_custkey
"""


@query("q_window_rank", oracle=_RANK_ORACLE, tags=("window",))
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 500)
    w_tie = Window.partitionBy("c_mktsegment").orderBy(F.desc("bal_bucket"))
    w_uniq = Window.partitionBy("c_mktsegment").orderBy(F.desc("bal_bucket"), F.asc("c_custkey"))
    return (
        c.withColumn("bal_bucket", bucket.cast("long"))
        .select(
            "c_custkey",
            "c_mktsegment",
            "bal_bucket",
            F.row_number().over(w_uniq).alias("rn"),
            F.rank().over(w_tie).alias("rnk"),
            F.dense_rank().over(w_tie).alias("drnk"),
            F.ntile(4).over(w_uniq).alias("quartile"),
            F.round(F.percent_rank().over(w_tie), 6).alias("pct_rnk"),
        )
        .orderBy("c_custkey")
    )


# Running total (ROWS UNBOUNDED PRECEDING) per customer over order history.

_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS running_spend,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS order_seq
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@query("q_window_running", oracle=_RUNNING_ORACLE, tags=("window",))
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).cast("long").alias("order_seq"),
    ).orderBy("o_custkey", "o_orderkey")


# Moving average (3-row window) + lag/lead per user event stream.

_MOVING_ORACLE = """
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3,
       ROUND(LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
       ROUND(LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS next_value,
       ROUND(FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS first_val
FROM events
ORDER BY user_id, event_id
"""


@query("q_window_moving", oracle=_MOVING_ORACLE, tags=("window",))
def q_window_moving(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_mov = w_ord.rowsBetween(-2, Window.currentRow)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w_mov), 6).alias("mov_avg3"),
        F.round(F.lag("value", 1).over(w_ord), 2).alias("prev_value"),
        F.round(F.lead("value", 1).over(w_ord), 2).alias("next_value"),
        F.round(F.first("value").over(w_cum), 2).alias("first_val"),
    ).orderBy("user_id", "event_id")


# RANGE frame on a numeric ordering column: orders within ±10000 totalprice.

_RANGEFRAME_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                           RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS BIGINT)
         AS n_similar_price
FROM orders
ORDER BY o_custkey, o_orderkey
"""


@query("q_window_range_frame", oracle=_RANGEFRAME_ORACLE, tags=("window",))
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-10000, 10000)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).cast("long").alias("n_similar_price"),
    ).orderBy("o_custkey", "o_orderkey")


_CUME_ORACLE = """
SELECT s_suppkey,
       ROUND(CUME_DIST() OVER (PARTITION BY s_nationkey
             ORDER BY FLOOR(s_acctbal / 500)), 6) AS cd,
       ROUND(NTH_VALUE(s_acctbal, 2) OVER (PARTITION BY s_nationkey
             ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_bal,
       ROUND(LAST_VALUE(s_acctbal) OVER (PARTITION BY s_nationkey
             ORDER BY s_acctbal, s_suppkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS max_bal
FROM supplier
ORDER BY s_suppkey
"""


@query("q_window_cume", oracle=_CUME_ORACLE, tags=("window",))
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    # partitioned by nation: cume_dist/nth_value over an UNpartitioned
    # window would single-task sort the whole (SF-growing) supplier
    # table — per-nation distribution stats are the scale-safe shape
    w_tie = Window.partitionBy("s_nationkey").orderBy(F.floor(F.col("s_acctbal") / 500))
    w_full = (
        Window.partitionBy("s_nationkey")
        .orderBy("s_acctbal", "s_suppkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return s.select(
        "s_suppkey",
        F.round(F.cume_dist().over(w_tie), 6).alias("cd"),
        F.round(F.nth_value("s_acctbal", 2).over(w_full), 2).alias("second_bal"),
        F.round(F.last("s_acctbal").over(w_full), 2).alias("max_bal"),
    ).orderBy("s_suppkey")


# Top-k per group: 3 biggest orders per customer (window + filter — the
# scalable formulation; no per-group collect).

_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) t WHERE rk <= 3
ORDER BY o_custkey, rk
"""


@query("q_topk_per_group", oracle=_TOPK_ORACLE, tags=("window", "topk"))
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"), "rk")
        .orderBy("o_custkey", "rk")
    )
