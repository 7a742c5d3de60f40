"""Third batch: Q15 (top revenue supplier via agg-of-agg), Q18 (large
orders via HAVING subquery), event funnel analysis, corpus bigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.queries import query

# Q15-style: supplier(s) with maximum revenue in a window — aggregate of
# an aggregate (the reference formulation uses a view + subquery max).

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE, tags=("join", "agg"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = load(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# Q18-style: customers with any single order above a quantity threshold
# (HAVING subquery → semi-join against an aggregated key set).

_Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN (SELECT l_orderkey, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big
  ON o_orderkey = big.l_orderkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
"""


@query("q18_large_orders", oracle=_Q18_ORACLE, tags=("join", "agg", "topk"))
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# Funnel analysis: signup → click → purchase per user, stages must occur
# in order (min qualifying timestamp per stage). Single pass per stage —
# conditional min aggregation, then stage flags.

_FUNNEL_ORACLE = """
SELECT user_id,
       CAST(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS did_signup,
       CAST(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS did_click,
       CAST(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS did_purchase
FROM (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click'
                   AND ts > (SELECT MIN(CASE WHEN e2.event_type = 'signup' THEN e2.ts END)
                             FROM events e2 WHERE e2.user_id = e1.user_id)
                  THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase'
                   AND ts > (SELECT MIN(CASE WHEN e3.event_type = 'click'
                                              AND e3.ts > (SELECT MIN(CASE WHEN e4.event_type = 'signup' THEN e4.ts END)
                                                           FROM events e4 WHERE e4.user_id = e1.user_id)
                                             THEN e3.ts END)
                             FROM events e3 WHERE e3.user_id = e1.user_id)
                  THEN ts END) AS t_purchase
  FROM events e1
  GROUP BY user_id
) t
ORDER BY user_id
"""


@query("q_funnel", oracle=_FUNNEL_ORACLE, tags=("window", "analytics"))
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel via two aggregation passes (no correlated
    subqueries): stage k's min timestamp among events after stage k-1's
    min timestamp. Each pass is one keyed aggregation — linear at scale.
    """
    e = load(spark, sf_dir, "events")
    t_signup = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup")
    )
    with_signup = e.join(t_signup, "user_id")
    t_click = with_signup.groupBy("user_id").agg(
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_signup")),
                F.col("ts"),
            )
        ).alias("t_click")
    )
    with_click = with_signup.join(t_click, "user_id")
    t_purchase = with_click.groupBy("user_id").agg(
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).alias("t_purchase")
    )
    funnel = (
        t_signup.join(t_click, "user_id").join(t_purchase, "user_id")
    )
    flag = lambda c: F.when(F.col(c).isNotNull(), 1).otherwise(0).cast("long")
    return funnel.select(
        "user_id",
        flag("t_signup").alias("did_signup"),
        flag("t_click").alias("did_click"),
        flag("t_purchase").alias("did_purchase"),
    ).orderBy("user_id")


# Corpus bigram profile: top 20 word bigrams (n-gram language profile).

_BIGRAM_ORACLE = """
SELECT bigram, n, rk FROM (
  SELECT bigram, COUNT(*) AS n,
         ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, bigram) AS rk
  FROM (
    SELECT UNNEST(LIST_TRANSFORM(
             RANGE(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) - 1, 1) + 1),
             i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(TRIM(text), '\\s+'), i, i + 1), ' ')
           )) AS bigram
    FROM documents
  ) t
  GROUP BY bigram
) ranked
WHERE rk <= 20
ORDER BY rk
"""


@query("q_top_bigrams", oracle=_BIGRAM_ORACLE, tags=("llm", "text"))
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
    bigrams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 2)))
    w = Window.orderBy(F.desc("n"), F.asc("bigram"))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .orderBy("rk")
    )
