"""Second relational batch: more TPC-H-style shapes (Q4 semi-join-agg,
Q6 filter-agg, Q7 nation-pair volume), sessionization, TF-IDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.queries import query

# Q6-style: pure filter + global agg — the fully-pushed-down scan shape.

_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_ORACLE, tags=("agg", "flagship"))
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Q4-style: order-priority counts for orders with at least one late item
# (semi-join + agg).

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE, tags=("join", "agg"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    late = o.join(
        l, (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# Q7-style: shipping volume between two nations by year.

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE, tags=("join", "agg"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# Q10-style: top returned-item customers by lost revenue.

_Q10_ORACLE = """
SELECT c_custkey, c_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE, tags=("join", "agg", "topk"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# Q14-style: promo revenue share (join + conditional aggregation).

_Q14_ORACLE = """
SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                               THEN l_extendedprice * (1 - l_discount)
                               ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


@query("q14_promo_revenue", oracle=_Q14_ORACLE, tags=("join", "agg"))
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.join(p, l.l_partkey == p.p_partkey).agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
            / F.sum(rev),
            6,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# Q19-style: disjunctive multi-clause predicates across a join (the
# predicate-pushdown stress shape).

_Q19_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 35)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 50)
"""


@query("q19_discounted_revenue", oracle=_Q19_ORACLE, tags=("join", "agg"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = l.join(p, p.p_partkey == l.l_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# Sessionization: Spark uses the native session_window operator; the
# oracle replays it with gaps-and-islands SQL (lag + cumulative sum) —
# two formulations, one semantics. 30-minute inactivity gap per user.

_SESSION_ORACLE = """
SELECT user_id, sess_start, sess_end, n_events, ROUND(total_value, 2) AS total_value
FROM (
  SELECT user_id,
         MIN(ts) AS sess_start,
         MAX(ts) + INTERVAL 30 MINUTE AS sess_end,
         COUNT(*) AS n_events,
         SUM(value) AS total_value
  FROM (
    SELECT user_id, ts, value,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
    FROM (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS is_new
      FROM events
    ) flagged
  ) numbered
  GROUP BY user_id, sess_id
) sessions
ORDER BY user_id, sess_start
"""


@query("q_sessionize", oracle=_SESSION_ORACLE, tags=("window", "streaming"))
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "sess_start")
    )


# TF-IDF: classic text weighting over the documents corpus; top-3 terms
# per document (explode → two aggregations → window top-k; every shuffle
# keyed on term or doc — the standard scalable formulation).

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS n,
         CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n_docs AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, term, tfidf, rk FROM (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * LN((SELECT n FROM n_docs) / (1.0 + df.df)), 6) AS tfidf,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * LN((SELECT n FROM n_docs) / (1.0 + df.df)) DESC,
                                     tf.term) AS rk
  FROM tf JOIN df ON tf.term = df.term
) t WHERE rk <= 3
ORDER BY doc_id, rk
"""


@query("q_tfidf_top_terms", oracle=_TFIDF_ORACLE, tags=("llm", "text"))
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import tfidf_top_terms

    return tfidf_top_terms(load(spark, sf_dir, "documents"), k=3).orderBy("doc_id", "rk")


# Q12-style: conditional aggregation over a fact-fact join. The classic
# Q12 buckets late shipments by ship mode; the synthetic lineitem has no
# l_shipmode/l_commitdate/l_receiptdate, so "late" is adapted to
# l_shipdate > o_orderdate + 60 days and the bucket key is l_returnflag
# (same shape: join + SUM(CASE) pivot-style counters).

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q12_late_priority", oracle=_Q12_ORACLE, tags=("join", "agg"))
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipment priority counts (TPC-H Q12 shape).

    Scale: the year filter pushes to the lineitem scan; the fact-fact
    join shuffles both sides on the order key (co-partitioned single
    exchange); the SUM(CASE) counters combine map-side so the final
    exchange carries one row per return flag.
    """
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# Dynamic-gap sessionization: each event carries its OWN inactivity gap
# (conversion events hold sessions open longer). Spark: session_window
# with a gap EXPRESSION. Oracle: gaps-and-islands generalized to a
# per-event gap — a session breaks where ts clears the running max of
# every preceding event's (ts + gap) window end.

_DYN_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_type IN ('signup', 'purchase')
              THEN INTERVAL 60 MINUTE ELSE INTERVAL 15 MINUTE END AS gap
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, ts + gap AS w_end,
         CASE WHEN MAX(ts + gap) OVER w IS NULL
                OR ts >= MAX(ts + gap) OVER w THEN 1 ELSE 0 END AS is_new
  FROM g
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS sess_start, MAX(w_end) AS sess_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered
GROUP BY user_id, sess_id
ORDER BY user_id, sess_start
"""


@query("q_sessionize_dynamic_gap", oracle=_DYN_SESSION_ORACLE, tags=("window", "streaming"))
def q_sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type").isin("signup", "purchase"), F.lit("60 minutes")
    ).otherwise(F.lit("15 minutes"))
    return (
        e.groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            F.col("session_window.end").alias("sess_end"),
            "n_events",
        )
        .orderBy("user_id", "sess_start")
    )
