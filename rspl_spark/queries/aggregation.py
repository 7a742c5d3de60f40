"""Aggregation queries (SURVEY.md §2.2 "Aggregation"): global agg, distinct
agg, stats, min_by/max_by, sorted collect, rollup/cube/grouping sets, pivot,
exact percentiles.

All aggregations are hash aggregates with map-side partial aggregation (the
Spark default) — at 100 TB the shuffle carries only per-group partials, not
rows. Grouping keys here are low-cardinality, so the final agg is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.queries import query

_GLOBAL_ORACLE = """
SELECT COUNT(*) AS n_rows,
       ROUND(SUM(l_quantity), 2) AS total_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
       ROUND(VAR_SAMP(l_discount), 6) AS var_disc
FROM lineitem
"""


@query("q_agg_global", oracle=_GLOBAL_ORACLE, tags=("agg",))
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_discount"), 6).alias("var_disc"),
    )


_DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_part,
       ROUND(SUM(DISTINCT l_quantity), 2) AS sum_dist_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_agg_distinct", oracle=_DISTINCT_ORACLE, tags=("agg",))
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_dist_qty"),
        )
        .orderBy("l_returnflag")
    )


# min_by/max_by (deterministic: the `by` column o_orderkey is unique) and
# sorted collect scalarized to a string for engine-neutral hashing.

_MINMAXBY_ORACLE = """
SELECT o_orderpriority,
       ROUND(ARG_MIN(o_totalprice, o_orderkey), 2) AS first_order_price,
       ROUND(ARG_MAX(o_totalprice, o_orderkey), 2) AS last_order_price,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_agg_minmax_by", oracle=_MINMAXBY_ORACLE, tags=("agg",))
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.min_by("o_totalprice", "o_orderkey"), 2).alias("first_order_price"),
            F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("last_order_price"),
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("statuses"),
        )
        .orderBy("o_orderpriority")
    )


# Rollup: subtotal rows surfaced via COALESCE(col, 'ALL') so both engines
# hash identical values (no NULL-vs-grouping ambiguity: data has no NULLs).

_ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


@query("q_rollup", oracle=_ROLLUP_ORACLE, tags=("agg",))
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
        .orderBy("returnflag", "linestatus")
    )


_CUBE_ORACLE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       ROUND(AVG(o_totalprice), 6) AS avg_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


@query("q_cube", oracle=_CUBE_ORACLE, tags=("agg",))
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "avg_price",
            "n_orders",
        )
        .orderBy("status", "priority")
    )


_GSETS_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY returnflag, linestatus
"""


@query("q_grouping_sets", oracle=_GSETS_ORACLE, tags=("agg",))
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # only lineitem is queried — registering all 10 views costs ~1s of
    # avoidable driver work on first call
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               ROUND(SUM(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus
        """
    )


# Pivot: order counts per priority × status. Oracle uses conditional
# aggregation (the ANSI formulation of pivot).

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_pivot", oracle=_PIVOT_ORACLE, tags=("agg",))
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
    ).orderBy("o_orderpriority")


# Exact continuous percentiles (Spark `percentile` == DuckDB `quantile_cont`).
# approx_percentile / approx_count_distinct are covered in pytest with
# tolerance bands — sketch outputs are not hash-comparable across engines.

_PCT_ORACLE = """
SELECT l_returnflag,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.5), 4) AS p50,
       ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90,
       ROUND(MEDIAN(l_quantity), 4) AS med_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q_percentiles", oracle=_PCT_ORACLE, tags=("agg",))
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    # ONE percentile buffer for all three l_extendedprice quantiles
    # (array-of-percentages form): each exact-percentile aggregate
    # buffers and shuffles the group's full value multiset, so three
    # scalar calls held three copies (r15 A/B at sf0.1: 2.86s -> 1.22s,
    # results bit-identical — same function, same interpolation).
    ps = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.9))
    )
    return (
        l.groupBy("l_returnflag")
        .agg(
            ps.alias("_ps"),
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_ps")[0], 4).alias("p25"),
            F.round(F.col("_ps")[1], 4).alias("p50"),
            F.round(F.col("_ps")[2], 4).alias("p90"),
            "med_qty",
        )
        .orderBy("l_returnflag")
    )


# Unpivot (melt): wide measure columns → long (attribute, value) rows —
# the inverse of q_pivot, DataFrame.unpivot native since Spark 3.4.
# Oracle replays it as a UNION ALL (portable long-form definition).

_UNPIVOT_ORACLE = """
SELECT o_orderkey, measure, ROUND(val, 2) AS val FROM (
  SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS val FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
) t
WHERE o_orderkey % 7 = 0
ORDER BY o_orderkey, measure
"""


@query("q_unpivot", oracle=_UNPIVOT_ORACLE, tags=("agg", "reshape"))
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    return (
        o.select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "val")
        .select("o_orderkey", "measure", F.round("val", 2).alias("val"))
        .orderBy("o_orderkey", "measure")
    )


# posexplode (lateral view with ordinality): token position is DATA —
# the building block for positional n-grams and alignment features.

_POSEXPLODE_ORACLE = """
SELECT doc_id, CAST(i - 1 AS INT) AS pos, toks[i] AS term
FROM (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks FROM documents
  WHERE doc_id % 17 = 0
) d, UNNEST(GENERATE_SERIES(1, LEN(d.toks))) AS g(i)
ORDER BY doc_id, pos
"""


@query("q_posexplode", oracle=_POSEXPLODE_ORACLE, tags=("scalar", "array"))
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 17 == 0)
    toks = F.split(F.trim("text"), r"\s+")
    return (
        d.select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .orderBy("doc_id", "pos")
    )
