"""Join queries (SURVEY.md §2.2 "Joins"): equi (inner/left/semi/anti),
multi-way with broadcast dims, theta/point-in-range, cross, as-of.

Scale notes (100 TB design):
- Only BOUNDED dimension tables (region: 5 rows, nation: 25 rows at every
  scale factor) carry explicit `F.broadcast` hints. Tables that grow with
  the scale factor (customer, supplier, part) are deliberately UNhinted: a
  forced hint overrides AQE's size check, and at 100× the filtered side can
  be hundreds of MB — an executor OOM. AQE converts those joins to
  broadcast at runtime exactly when the build side is actually small
  (plan-verified in tests/test_scale_patterns.py).
- Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; both sides
  partition on the same key so the join is a single co-partitioned exchange.
- The as-of join is the scalable one-pass formulation: union-free, a single
  window over (key, time) — NOT a per-row range self-join, which would be
  O(n²) per key at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.queries import query

# --------------------------------------------------------------------------
# TPC-H-style Q3: 3-way join + agg + top-k.
# --------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE, tags=("join", "agg", "topk"))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # No forced broadcast on customer: at 100× scale the filtered segment
    # is ~3M rows — a forced hint would override AQE's size check and risk
    # driver/executor OOM. AQE converts to broadcast at runtime whenever
    # the build side is actually small (verified by plan test at sf0.1).
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# TPC-H-style Q5: 6-way join (fact + 5 dims) with broadcast dimensions.
# --------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_local_supplier", oracle=_Q5_ORACLE, tags=("join", "agg"))
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier is 100× smaller than customer but still fact-scaled —
        # leave the broadcast decision to AQE (region/nation keep explicit
        # hints: they are bounded at 5/25 rows at every scale factor).
        .join(
            s,
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# --------------------------------------------------------------------------
# Outer join: every customer with their order count / total (0 for none).
# --------------------------------------------------------------------------

_LEFT_ORACLE = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       ROUND(COALESCE(SUM(o_totalprice), 0.0), 2) AS total_spent
FROM customer
LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


@query("q_join_left_outer", oracle=_LEFT_ORACLE, tags=("join",))
def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


_FULL_ORACLE = """
SELECT COALESCE(a.nk, b.nk) AS nk,
       COALESCE(a.n_cust, 0) AS n_cust,
       COALESCE(b.n_supp, 0) AS n_supp
FROM (SELECT CAST(c_nationkey AS BIGINT) AS nk, COUNT(*) AS n_cust
      FROM customer WHERE c_acctbal > 9500 GROUP BY c_nationkey) a
FULL JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nk, COUNT(*) AS n_supp
           FROM supplier GROUP BY s_nationkey) b
  ON a.nk = b.nk
ORDER BY nk
"""


@query("q_join_full_outer", oracle=_FULL_ORACLE, tags=("join",))
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = (
        c.filter(F.col("c_acctbal") > 9500)
        .groupBy(F.col("c_nationkey").cast("long").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    b = s.groupBy(F.col("s_nationkey").cast("long").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        a.join(b, a.nk == b.nk, "full")
        .select(
            F.coalesce(a.nk, b.nk).alias("nk"),
            F.coalesce(F.col("n_cust"), F.lit(0)).alias("n_cust"),
            F.coalesce(F.col("n_supp"), F.lit(0)).alias("n_supp"),
        )
        .orderBy("nk")
    )


_RIGHT_ORACLE = """
SELECT o_orderkey, c_name
FROM customer RIGHT JOIN orders ON c_custkey = o_custkey AND c_acctbal > 9000
ORDER BY o_orderkey
"""


@query("q_join_right_outer", oracle=_RIGHT_ORACLE, tags=("join",))
def q_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, (c.c_custkey == o.o_custkey) & (c.c_acctbal > 9000), "right")
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Semi / anti joins.
# --------------------------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
ORDER BY c_custkey
"""


@query("q_join_semi", oracle=_SEMI_ORACLE, tags=("join",))
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


@query("q_join_anti", oracle=_ANTI_ORACLE, tags=("join",))
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# Theta join (equi + inequality): for each supplier, customers in the same
# nation with a larger account balance. Equi-part keys the shuffle; the
# inequality is a post-join filter — stays a hash join, not a BNLJ.
# --------------------------------------------------------------------------

_THETA_ORACLE = """
SELECT s_suppkey,
       COUNT(*) AS n_richer_cust,
       ROUND(MAX(c_acctbal), 2) AS max_cust_bal
FROM supplier
JOIN customer ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
GROUP BY s_suppkey
ORDER BY s_suppkey
"""


@query("q_join_theta", oracle=_THETA_ORACLE, tags=("join",))
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        s.join(c, (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_richer_cust"),
            F.round(F.max("c_acctbal"), 2).alias("max_cust_bal"),
        )
        .orderBy("s_suppkey")
    )


# Pure non-equi (theta-only) join: no equality component → Spark must
# use a broadcast nested-loop join. Kept tiny×small on purpose (BNLJ is
# O(n·m); at scale you bound one side or band the condition).

_PURE_THETA_ORACLE = """
SELECT r_name, COUNT(*) AS n_supp, ROUND(SUM(s_acctbal), 2) AS bal_sum
FROM region JOIN supplier ON s_acctbal > r_regionkey * 1500.0
GROUP BY r_name
ORDER BY r_name
"""


@query("q_join_pure_theta", oracle=_PURE_THETA_ORACLE, tags=("join",))
def q_join_pure_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    s = load(spark, sf_dir, "supplier")
    return (
        r.join(s, s.s_acctbal > r.r_regionkey * 1500.0)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        )
        .orderBy("r_name")
    )


# --------------------------------------------------------------------------
# Cross join (tiny × tiny only — never meaningful at fact scale).
# --------------------------------------------------------------------------

_CROSS_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
ORDER BY r_name, n_name
"""


@query("q_cross_join", oracle=_CROSS_ORACLE, tags=("join",))
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name").orderBy("r_name", "n_name")


# --------------------------------------------------------------------------
# As-of join: for each click event, the most recent purchase by the same
# user at-or-before the click. Scalable single-window formulation: one
# shuffle on user_id, one sort on (ts, event_id), O(n) per partition —
# mirrors SURVEY §2.2 "as-of (nearest earlier event)".
# --------------------------------------------------------------------------

_ASOF_ORACLE = """
SELECT event_id, user_id, ts, last_purchase_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
  FROM events
) t
WHERE event_type = 'click'
ORDER BY event_id
"""


@query("q_asof_join", oracle=_ASOF_ORACLE, tags=("join", "asof"))
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.asof import asof_last

    e = load(spark, sf_dir, "events")
    marked = asof_last(
        e,
        key_col="user_id",
        ts_col="ts",
        mark=F.when(F.col("event_type") == "purchase", F.col("ts")),
        out_col="last_purchase_ts",
        tiebreak_col="event_id",
    )
    return (
        marked.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
        .orderBy("event_id")
    )


# Forward as-of (merge_asof direction='forward'): for each click, the
# NEXT purchase at-or-after it — same one-pass window, frame flipped.

_ASOF_FWD_ORACLE = """
SELECT event_id, user_id, ts, next_purchase_ts FROM (
  SELECT event_id, user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_purchase_ts
  FROM events
) t
WHERE event_type = 'click'
ORDER BY event_id
"""


@query("q_asof_join_forward", oracle=_ASOF_FWD_ORACLE, tags=("join", "asof"))
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.asof import asof_next

    e = load(spark, sf_dir, "events")
    marked = asof_next(
        e,
        key_col="user_id",
        ts_col="ts",
        mark=F.when(F.col("event_type") == "purchase", F.col("ts")),
        out_col="next_purchase_ts",
        tiebreak_col="event_id",
    )
    return (
        marked.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "next_purchase_ts")
        .orderBy("event_id")
    )


# As-of with a staleness bound (pandas merge_asof tolerance): purchases
# older than 30 minutes stop matching. Same one-pass window shape.

_ASOF_TOL_ORACLE = """
SELECT event_id, user_id, ts,
       CASE WHEN EPOCH_US(ts) - EPOCH_US(last_purchase_ts) <= 1800000000
            THEN last_purchase_ts END AS last_purchase_ts
FROM (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
  FROM events
) t
WHERE event_type = 'click'
ORDER BY event_id
"""


@query("q_asof_join_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "asof"))
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.asof import asof_last_within

    e = load(spark, sf_dir, "events")
    marked = asof_last_within(
        e,
        key_col="user_id",
        ts_col="ts",
        mark=F.when(F.col("event_type") == "purchase", F.col("ts")),
        out_col="last_purchase_ts",
        tolerance_seconds=1800,
        tiebreak_col="event_id",
    )
    return (
        marked.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts", "last_purchase_ts")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Point-in-range (interval) join: events of the same user within 1 hour
# after each signup. Equi on user_id keys the shuffle; range is a filter.
# --------------------------------------------------------------------------

_RANGE_ORACLE = """
SELECT s.event_id AS signup_id,
       COUNT(e.event_id) AS n_followup,
       ROUND(COALESCE(SUM(e.value), 0.0), 2) AS followup_value
FROM (SELECT * FROM events WHERE event_type = 'signup') s
LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.ts
 AND e.ts <= s.ts + INTERVAL 1 HOUR
GROUP BY s.event_id
ORDER BY s.event_id
"""


@query("q_interval_join", oracle=_RANGE_ORACLE, tags=("join", "range"))
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    e = ev.select("event_id", "user_id", "ts", "value")
    joined = s.join(
        e,
        (e.user_id == s.s_user)
        & (e.ts > s.s_ts)
        & (e.ts <= s.s_ts + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("signup_id")
        .agg(
            F.count("event_id").alias("n_followup"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("followup_value"),
        )
        .orderBy("signup_id")
    )


# Q21-style: suppliers who kept multi-supplier orders waiting — the only
# TPC-H shape with TWO correlated subqueries (EXISTS + NOT EXISTS) over
# the same fact table. "Late" is adapted to l_shipdate > o_orderdate +
# 60 days (the synthetic lineitem has no commit/receipt dates). The
# oracle uses the literal correlated-subquery form; the Spark side uses
# the distributed formulation: one per-order aggregate (supplier count,
# late-supplier count) joined back to the late lineitems — decorrelation
# by hand, which is exactly how this shape must run at scale.

_Q21_ORACLE = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


@query("q21_waiting_suppliers", oracle=_Q21_ORACLE, tags=("join", "agg", "topk"))
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for late multi-supplier orders
    (TPC-H Q21 shape, cf. dbgen queries/21.sql).

    Scale: both correlated subqueries collapse into ONE per-order
    aggregate pass (countDistinct supplier / late supplier) — the fact
    table is scanned once for the aggregate and once for the late rows,
    both shuffled on l_orderkey so the join is co-partitioned; supplier
    is small-side (AQE broadcasts it); the final top-10 is
    TakeOrderedAndProject, no global sort.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    lj = l.join(o, l.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
    )
    per_order = lj.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    )
    blamed = (
        lj.filter(F.col("is_late"))
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# Binned range join: point-in-interval with NO equi key — the pure-range
# shape whose naive plan is a nested-loop scan. The operator
# (operators/rangejoin.py) quantizes time into bins so the join is an
# equi-join on the bin id with an exact post-filter; the oracle runs the
# plain quadratic range join. Every signup's one-hour window counts ALL
# users' events inside it (not just the signup's own user — that keyed
# variant is q_interval_join).

_BINNED_RANGE_ORACLE = """
SELECT s.event_id AS signup_id,
       COUNT(e.event_id) AS n_in,
       ROUND(COALESCE(SUM(e.value), 0.0), 2) AS tot_value
FROM (SELECT event_id, ts AS ts_start, ts + INTERVAL 1 HOUR AS ts_end
      FROM events WHERE event_type = 'signup') s
LEFT JOIN events e
  ON e.ts >= s.ts_start AND e.ts <= s.ts_end AND e.event_id <> s.event_id
GROUP BY s.event_id
ORDER BY signup_id
"""


@query("q_binned_range_join", oracle=_BINNED_RANGE_ORACLE, tags=("join", "range", "scale"))
def q_binned_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.rangejoin import point_in_interval_pairs

    ev = load(spark, sf_dir, "events")
    intervals = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("ts_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts_end"),
    )
    points = ev.select("event_id", "ts", "value")
    pairs = point_in_interval_pairs(
        points, intervals, point_ts="ts", start_ts="ts_start", end_ts="ts_end"
    ).filter(F.col("event_id") != F.col("signup_id"))
    hits = pairs.groupBy("signup_id").agg(
        F.count("event_id").alias("n_in"),
        F.round(F.sum("value"), 2).alias("tot_value"),
    )
    return (
        intervals.select("signup_id")
        .join(hits, "signup_id", "left")
        .select(
            "signup_id",
            F.coalesce(F.col("n_in"), F.lit(0)).alias("n_in"),
            F.round(F.coalesce(F.col("tot_value"), F.lit(0.0)), 2).alias("tot_value"),
        )
        .orderBy("signup_id")
    )
