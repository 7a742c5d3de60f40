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


# Q8-style: market share of one nation inside a region's order volume.

_Q8_ORACLE = """
SELECT o_year,
       ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END) / SUM(volume), 6)
         AS mkt_share
FROM (
  SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE, tags=("join", "agg"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1k"), F.col("n_regionkey").alias("n1r"))
    n2 = n.select(F.col("n_nationkey").alias("n2k"), F.col("n_name").alias("nation"))
    j = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1k"))
        .join(F.broadcast(r), F.col("n1r") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2k"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# Q13-style: distribution of order counts per customer (agg of an outer
# join agg — the histogram-of-histogram shape).

_Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE, tags=("join", "agg"))
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# Q17-style: revenue impact of small-quantity orders vs the part's
# average (correlated-avg → join against a per-part aggregate).

_Q17_ORACLE = """
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       COUNT(*) AS n_small
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (SELECT l_partkey AS agg_pk, 0.5 * AVG(l_quantity) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey) pa
  ON p_partkey = agg_pk
WHERE p_brand = 'Brand#5' AND l_quantity < half_avg_qty
"""


@query("q17_small_qty_revenue", oracle=_Q17_ORACLE, tags=("join", "agg"))
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    pa = l.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(pa, p.p_partkey == pa.agg_pk)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# Q22-style: customers with above-average balance and no orders
# (scalar-subquery threshold + anti join).

_Q22_ORACLE = """
SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
ORDER BY nk
"""


@query("q22_global_sales_opportunity", oracle=_Q22_ORACLE, tags=("join", "agg"))
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("ab"))
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    no_orders = rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
    return (
        no_orders.groupBy(F.col("c_nationkey").cast("long").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("nk")
    )


# Time-bucketed aggregation (the batch face of the streaming tumbling
# window): Spark window() vs DuckDB time_bucket.

_TIMEBUCKET_ORACLE = """
SELECT win_start, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
FROM (SELECT TIME_BUCKET(INTERVAL 6 HOUR, ts) AS win_start, event_type, value FROM events) t
GROUP BY win_start, event_type
ORDER BY win_start, event_type
"""


@query("q_time_bucket", oracle=_TIMEBUCKET_ORACLE, tags=("window", "streaming"))
def q_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "6 hours").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total")
        .orderBy("win_start", "event_type")
    )


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


# Gopher-style within-document repetition signals (operators.text.
# repetition_signals): top-token / top-bigram coverage and repeated-
# trigram fraction. Docs shorter than k tokens get NULL k-gram fractions
# (no truncated pseudo-grams), replayed by the oracle's LEN(ts) >= k
# filters + left joins.

_REP_ORACLE = """
WITH base AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS ts FROM documents
),
c1 AS (
  SELECT doc_id, gram, COUNT(*) AS n
  FROM (SELECT doc_id, UNNEST(ts) AS gram FROM base) x
  GROUP BY doc_id, gram
),
a1 AS (SELECT doc_id, MAX(n) AS top, SUM(n) AS total FROM c1 GROUP BY doc_id),
c2 AS (
  SELECT doc_id, gram, COUNT(*) AS n
  FROM (SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ts)),
                      i -> ts[i] || ' ' || ts[i + 1])) AS gram
        FROM base WHERE LEN(ts) >= 2) x
  GROUP BY doc_id, gram
),
a2 AS (SELECT doc_id, MAX(n) AS top, SUM(n) AS total FROM c2 GROUP BY doc_id),
c3 AS (
  SELECT doc_id, gram, COUNT(*) AS n
  FROM (SELECT doc_id,
               UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ts) - 1),
                      i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS gram
        FROM base WHERE LEN(ts) >= 3) x
  GROUP BY doc_id, gram
),
a3 AS (
  SELECT doc_id, SUM(n) AS total,
         SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS dup
  FROM c3 GROUP BY doc_id
)
SELECT a1.doc_id,
       CAST(a1.total AS BIGINT) AS n_tokens,
       ROUND(CAST(a1.top AS DOUBLE) / a1.total, 6) AS top_token_frac,
       ROUND(CAST(a2.top AS DOUBLE) / a2.total, 6) AS top_bigram_frac,
       ROUND(CAST(a3.dup AS DOUBLE) / a3.total, 6) AS dup_trigram_frac
FROM a1 LEFT JOIN a2 ON a1.doc_id = a2.doc_id
        LEFT JOIN a3 ON a1.doc_id = a3.doc_id
ORDER BY a1.doc_id
"""


@query("q_repetition_signals", oracle=_REP_ORACLE, tags=("llm", "text"))
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import repetition_signals

    d = load(spark, sf_dir, "documents")
    return repetition_signals(d).orderBy("doc_id")


@query("q_top_bigrams", oracle=_BIGRAM_ORACLE, tags=("llm", "text"))
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 bigrams via the vectorized Arrow counting kernel
    (text.bigram_count_kernel): per-partition Counter partials replace
    the per-occurrence JVM explode — the actual sf10 bottleneck was
    the 27.5M-row explode materialization, NOT the aggregate shuffle
    (map-side combine already collapses this corpus's ~2k-bigram
    vocabulary; the CMS-prefilter alternative is the recorded negative
    result — DEVNOTES round 8). Top-20 via TakeOrdered; the rank
    window runs over <= 20 rows."""
    from rspl_spark.operators.text import bigram_count_kernel

    d = load(spark, sf_dir, "documents")
    counts = bigram_count_kernel(d)
    top = counts.orderBy(F.desc("n"), F.asc("bigram")).limit(20)
    w = Window.orderBy(F.desc("n"), F.asc("bigram"))
    return top.withColumn(
        "rk", F.row_number().over(w)
    ).select("bigram", F.col("n").cast("long").alias("n"), "rk").orderBy("rk")


# BM25 keyword search (operators/text.py::bm25_search): Lucene's
# Robertson/Sparck-Jones formulation with bag-of-terms query semantics
# (the repeated 'join' term doubles its contribution) and dl = 0 for
# empty docs. Ranking is on the ROUNDED score (6dp) so the (score,
# doc_id) order is replayable across engines whose per-doc term-sum
# float order differs; every other quantity (dl, avgdl, N, df, tf) is
# integer-exact arithmetic promoted identically.

_BM25_TERMS = ("join", "join", "vector", "customer")  # bag: 'join' x2
_BM25_K1, _BM25_B, _BM25_K = 1.2, 0.75, 15


def _bm25_oracle() -> str:
    terms = sorted(set(_BM25_TERMS))
    qtf = {t: _BM25_TERMS.count(t) for t in terms}
    tlist = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    qtf_case = "CASE t.term " + " ".join(
        f"WHEN '{t}' THEN {float(c)!r}" for t, c in qtf.items()
    ) + " END"
    return f"""
WITH bm_base AS (
  SELECT doc_id,
         LIST_FILTER(STRING_SPLIT_REGEX(TRIM(COALESCE(text, '')), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
bm_dl AS (SELECT doc_id, CAST(LEN(ts) AS BIGINT) AS dl FROM bm_base),
bm_stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM bm_dl
),
bm_tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, UNNEST(ts) AS term FROM bm_base) x
  WHERE term IN (SELECT UNNEST({tlist}))
  GROUP BY doc_id, term
),
bm_df AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS dfreq FROM bm_tf GROUP BY term),
bm_scored AS (
  SELECT t.doc_id,
         ROUND(SUM(({qtf_case})
               * LN(1.0 + (s.n - d.dfreq + 0.5) / (d.dfreq + 0.5))
               * t.tf * {_BM25_K1 + 1.0!r}
               / (t.tf + {_BM25_K1!r} * ({1.0 - _BM25_B!r} + {_BM25_B!r}
                  * CAST(l.dl AS DOUBLE) / s.avgdl))), 6) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM bm_tf t
  JOIN bm_df d ON t.term = d.term
  JOIN bm_dl l ON t.doc_id = l.doc_id
  CROSS JOIN bm_stats s
  GROUP BY t.doc_id
)
SELECT doc_id, score, n_terms_hit, rk FROM (
  SELECT doc_id, score, n_terms_hit,
         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk
  FROM bm_scored
) z WHERE rk <= {_BM25_K}
ORDER BY rk"""


@query("q_bm25_search", oracle=_bm25_oracle(), tags=("llm", "text"))
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import bm25_search

    d = load(spark, sf_dir, "documents")
    return bm25_search(
        d, list(_BM25_TERMS), k1=_BM25_K1, b=_BM25_B, k=_BM25_K
    ).orderBy("rk")
