"""TPC-H partsupp-shaped queries (Q2/Q9/Q11/Q16/Q20) over a
*deterministically derived* partsupp table.

`/root/testdata` ships no partsupp parquet, but every column of TPC-H's
partsupp is derivable from the tables that DO exist, with a formula both
engines (Spark and the DuckDB oracle) can replay bit-for-bit:

- keys: each part gets exactly 4 suppliers,
  ``ps_suppkey = (p_partkey + i * max(1, ns//4)) % ns`` for i in 0..3
  (ns = supplier count; the stride max(1, ns//4) makes the four offsets
  distinct mod ns for every ns >= 4, mirroring TPC-H dbgen's own
  "spread the suppliers" key formula);
- ``ps_availqty``: 1 + H(key) % 9999 where H is the repo's portable
  60-bit hash (first 15 hex chars of md5 — identical in Spark and
  DuckDB, see queries/llm_ops.py);
- ``ps_supplycost``: derived in integer *cents* (100..99999) from the
  same hash family, exposed both as ``ps_supplycost_cents`` (BIGINT —
  exact aggregation, no float drift) and ``ps_supplycost`` (one final
  division by 100.0, the same IEEE operation in both engines).

100 TB design: the derivation is a pure scan-side projection over
``part`` (4-way explode of a literal array — no shuffle, no join); at
cluster scale partsupp would be CTAS'd once into a bucketed table, but
as a *derived frame* it composes into each query and lets Catalyst push
part-side predicates (p_size/p_name/p_type) BELOW the explode, so e.g.
Q2 derives partsupp rows only for the ~50 parts that survive the
filter. The supplier count is a driver-side metadata scalar (one
count() over the dimension table).

Reference parity: the reference has no relational layer (SURVEY.md §1);
these shapes come from the declared engine surface (SURVEY.md §2.2
joins/aggregation rows — Q4/Q21 correlated shapes already gated in
relational2.py; this module closes the partsupp family flagged as the
top gap in VERDICT.md round 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.queries import query

# ---------------------------------------------------------------------------
# Derivation (Spark side)
# ---------------------------------------------------------------------------


def _h60(col: F.Column) -> F.Column:
    """Portable 60-bit hash: bigint(first 15 hex chars of md5(s))."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp frame (see module docstring for the contract).

    Columns: ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents
    (all BIGINT), ps_supplycost (DOUBLE = cents / 100.0).
    """
    ns = load(spark, sf_dir, "supplier").count()  # dimension-table scalar
    step = max(1, ns // 4)
    part = load(spark, sf_dir, "part")
    ps = part.select(
        F.col("p_partkey").cast("bigint").alias("ps_partkey"),
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
    ).select(
        "ps_partkey",
        F.pmod(F.col("ps_partkey") + F.col("i") * F.lit(step), F.lit(ns))
        .cast("bigint")
        .alias("ps_suppkey"),
    )
    key = F.concat_ws(
        ":", F.col("ps_partkey").cast("string"), F.col("ps_suppkey").cast("string")
    )
    cents = (F.lit(100) + F.pmod(_h60(F.concat(key, F.lit("#cost"))), F.lit(99900))).cast(
        "bigint"
    )
    return ps.select(
        "ps_partkey",
        "ps_suppkey",
        (F.lit(1) + F.pmod(_h60(key), F.lit(9999))).cast("bigint").alias("ps_availqty"),
        cents.alias("ps_supplycost_cents"),
        (cents / F.lit(100.0)).alias("ps_supplycost"),
    )


# DuckDB side of the same derivation, prefixed into every oracle below.
# GREATEST(1, n//4) / % replay Spark's max(1, ns//4) / pmod exactly
# (all operands non-negative); '0x'||substr(md5,1,15) is the repo's
# portable-hash oracle form.
_PARTSUPP_CTE = """
WITH ps_keys AS (
  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
         CAST((p_partkey + i.i * GREATEST(1, (SELECT COUNT(*) FROM supplier) // 4))
              % (SELECT COUNT(*) FROM supplier) AS BIGINT) AS ps_suppkey
  FROM part CROSS JOIN (VALUES (0),(1),(2),(3)) AS i(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(1 + CAST('0x' || SUBSTR(MD5(CAST(ps_partkey AS VARCHAR) || ':' ||
              CAST(ps_suppkey AS VARCHAR)), 1, 15) AS BIGINT) % 9999 AS BIGINT)
           AS ps_availqty,
         CAST(100 + CAST('0x' || SUBSTR(MD5(CAST(ps_partkey AS VARCHAR) || ':' ||
              CAST(ps_suppkey AS VARCHAR) || '#cost'), 1, 15) AS BIGINT) % 99900 AS BIGINT)
           AS ps_supplycost_cents,
         (100 + CAST('0x' || SUBSTR(MD5(CAST(ps_partkey AS VARCHAR) || ':' ||
              CAST(ps_suppkey AS VARCHAR) || '#cost'), 1, 15) AS BIGINT) % 99900) / 100.0
           AS ps_supplycost
  FROM ps_keys
)
"""


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier (correlated MIN subquery -> window min)
# ---------------------------------------------------------------------------

_Q2_ORACLE = _PARTSUPP_CTE + """
SELECT s_acctbal, s_name, n_name, ps_partkey, p_name, ps_supplycost
FROM partsupp
JOIN part ON p_partkey = ps_partkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = partsupp.ps_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE, tags=("join", "partsupp", "window"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape. The correlated MIN-per-part subquery becomes a
    window min over the *already region-filtered* partsupp frame — one
    shuffle on ps_partkey instead of a rejoin of the whole subquery;
    supplier/nation/region are broadcast dims."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # European (supplier, nation) pairs — broadcast-sized dims.
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey)
    w = Window.partitionBy("ps_partkey")
    best = regional.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    return (
        best.join(F.broadcast(p), best.ps_partkey == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "ps_partkey", "p_name", "ps_supplycost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by nation and year
# ---------------------------------------------------------------------------

_Q9_ORACLE = _PARTSUPP_CTE + """
SELECT nation, o_year,
       ROUND(SUM(amount_micro) / 1000000.0, 2) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
         CAST(FLOOR((l_extendedprice * (1 - l_discount)
           - (ps_supplycost_cents / 100.0) * l_quantity) * 1000000) AS BIGINT)
           AS amount_micro
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_type_profit", oracle=_Q9_ORACLE, tags=("join", "agg", "partsupp"))
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape. p_name filter prunes part FIRST, the filtered
    part keys prune the derived partsupp below its explode (Catalyst
    pushes p_partkey IN-set through the join), and part/partsupp/
    supplier/nation all broadcast against the lineitem fact scan —
    lineitem (the 100 TB table) is never shuffled until the final
    (nation, year) aggregate."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    ps = derived_partsupp(spark, sf_dir)
    # Derive partsupp only for filtered parts: join prunes the explode input.
    ps = ps.join(
        F.broadcast(p.select("p_partkey")), ps.ps_partkey == F.col("p_partkey")
    ).select("ps_partkey", "ps_suppkey", "ps_supplycost_cents")
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        l.join(
            F.broadcast(ps),
            (l.l_partkey == ps.ps_partkey) & (l.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        F.col("ps_supplycost_cents") / F.lit(100.0)
    ) * F.col("l_quantity")
    # Exact-integer sum: floor each per-row double into micro-units
    # (identical double -> identical floor in both engines), sum as
    # BIGINT (order-insensitive), ONE final division — the group-by SUM
    # of raw doubles is order-nondeterministic and flipped a round(2)
    # boundary at sf0.01.
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            F.floor(amount * F.lit(1000000)).cast("bigint").alias("amount_micro"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.round(F.sum("amount_micro") / F.lit(1000000.0), 2).alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: important stock identification (exact integer-cents value)
# ---------------------------------------------------------------------------

_Q11_ORACLE = _PARTSUPP_CTE + """
SELECT ps_partkey, CAST(SUM(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
FROM partsupp
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'EUROPE'
GROUP BY ps_partkey
HAVING SUM(ps_supplycost_cents * ps_availqty) > (
  SELECT 2.0 * SUM(v) / COUNT(*) FROM (
    SELECT ps_partkey AS pk, SUM(ps_supplycost_cents * ps_availqty) AS v
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY ps_partkey))
ORDER BY value_cents DESC, ps_partkey
"""


@query("q11_important_stock", oracle=_Q11_ORACLE, tags=("agg", "partsupp"))
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape. Stock value is aggregated in integer cents
    (BIGINT — exact, order-insensitive, no float drift); the global
    threshold is ONE extra reduction over the same per-part aggregate
    (reused, not recomputed from the base scan) joined back as a
    broadcast scalar — the two-pass shape a 100 TB plan wants.

    Threshold is SCALE-INVARIANT: 2x the mean per-part value, not
    TPC-H's literal fixed fraction (whose selectivity collapses to the
    empty set as the part count grows — the spec itself scales the
    fraction by 1/SF; the r7 sf10 sweep caught the fixed form returning
    0 rows beyond sf0.01)."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey")
    )
    regional = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey)
    per_part = regional.groupBy("ps_partkey").agg(
        F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
        .cast("bigint")
        .alias("value_cents")
    )
    total = per_part.agg(
        (F.lit(2.0) * F.sum("value_cents") / F.count(F.lit(1))).alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("threshold"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "ps_partkey")
    )


# ---------------------------------------------------------------------------
# Q16 shape: parts/supplier relationship (NOT IN -> anti join)
# ---------------------------------------------------------------------------

# s_comment does not exist in the testdata supplier table; the
# "Customer Complaints" exclusion set is a deterministic ~10% subset
# derived from the portable hash of s_name (same formula both engines).
_Q16_ORACLE = _PARTSUPP_CTE + """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier
    WHERE CAST('0x' || SUBSTR(MD5(s_name || '#complaints'), 1, 15) AS BIGINT) % 10 = 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_parts_supplier", oracle=_Q16_ORACLE, tags=("join", "agg", "partsupp"))
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape. NOT IN over a provably non-null key set becomes
    a broadcast left-anti join; COUNT(DISTINCT) runs on the already
    part-filtered frame. Part filters push into the partsupp
    derivation's part scan."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    ps = derived_partsupp(spark, sf_dir)
    complainers = (
        load(spark, sf_dir, "supplier")
        .filter(F.pmod(_h60(F.concat(F.col("s_name"), F.lit("#complaints"))), F.lit(10)) == 0)
        .select("s_suppkey")
    )
    joined = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(complainers), ps.ps_suppkey == F.col("s_suppkey"), "left_anti")
    )
    return (
        joined.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q20 shape: potential part promotion (correlated agg -> pre-aggregated join)
# ---------------------------------------------------------------------------

_Q20_ORACLE = _PARTSUPP_CTE + """
SELECT s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT ps_suppkey
  FROM partsupp
  JOIN (SELECT l_partkey, l_suppkey, 0.5 * SUM(l_quantity) AS half_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_partkey, l_suppkey) shipped
    ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    AND ps_availqty > half_qty)
ORDER BY s_name
"""


@query("q20_potential_promotion", oracle=_Q20_ORACLE, tags=("join", "partsupp"))
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape. The correlated per-(part,supplier) quantity
    subquery becomes ONE partial-aggregated groupBy over the filtered
    lineitem year slice, inner-joined to the part-pruned partsupp
    (inner join ≡ the SQL NULL-excluding comparison); the surviving
    supplier keys semi-join the supplier dim."""
    small = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    ps = derived_partsupp(spark, sf_dir).join(
        F.broadcast(small), F.col("ps_partkey") == F.col("p_partkey")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = l.groupBy("l_partkey", "l_suppkey").agg(
        (F.lit(0.5) * F.sum("l_quantity")).alias("half_qty")
    )
    qualified = (
        ps.join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey) & (ps.ps_suppkey == shipped.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .select("s_name", F.col("s_nationkey").cast("bigint").alias("s_nationkey"))
        .orderBy("s_name")
    )
