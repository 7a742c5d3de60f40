"""Projection / filter / scalar-function queries (SURVEY.md §2.2
"Projection / filter / scalar").

Each query is a Spark DataFrame program plus a DuckDB oracle computing the
same result. Scalar functions stay JVM-side (pyspark.sql.functions — no
Python UDFs) so the whole plan is whole-stage-codegen'd and the filter /
projection reach the parquet scan (predicate pushdown + column pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.queries import query

# --------------------------------------------------------------------------
# TPC-H-style Q1: scan → filter → group-agg. The flagship query: the filter
# is pushed into the parquet scan, aggregation is partial (map-side) then
# final — one shuffle on a low-cardinality key. Scales linearly in input.
# --------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       ROUND(AVG(l_extendedprice), 6) AS avg_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE, tags=("agg", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# String functions (concat, substr, upper/lower, trim, regexp, length)
# + filter predicates (LIKE, IN, BETWEEN). All codegen'd expressions.
# --------------------------------------------------------------------------

_STRING_ORACLE = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_type) AS type_lower,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       SUBSTR(p_type, 1, 4) AS type_prefix,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       TRIM(p_name) AS name_trim,
       CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
       REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_devowel,
       REPLACE(p_type, 'STANDARD', 'STD') AS type_short
FROM part
WHERE p_name LIKE '%a%'
  AND p_size BETWEEN 5 AND 40
  AND p_type IN ('STANDARD', 'LARGE', 'SMALL', 'PROMO')
ORDER BY p_partkey
"""


@query("q_string_fns", oracle=_STRING_ORACLE, tags=("scalar",))
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%a%")
            & F.col("p_size").between(5, 40)
            & F.col("p_type").isin("STANDARD", "LARGE", "SMALL", "PROMO")
        )
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.lower("p_type").alias("type_lower"),
            F.length("p_name").cast("long").alias("name_len"),
            F.substring("p_type", 1, 4).alias("type_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.trim(F.col("p_name")).alias("name_trim"),
            F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("long").alias("brand_num"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devowel"),
            F.replace(F.col("p_type"), F.lit("STANDARD"), F.lit("STD")).alias("type_short"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# CASE WHEN conditional logic.
# --------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_class,
       CASE o_orderstatus WHEN 'F' THEN 'finished'
                          WHEN 'O' THEN 'open'
                          ELSE 'partial' END AS status_desc,
       CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'large' END AS size_bucket
FROM orders
ORDER BY o_orderkey
"""


@query("q_case_when", oracle=_CASE_ORACLE, tags=("scalar",))
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_class"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_desc"),
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("large")
        .alias("size_bucket"),
    ).orderBy("o_orderkey")


# --------------------------------------------------------------------------
# Date/time functions.
# --------------------------------------------------------------------------

_DATETIME_ORACLE = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS o_month,
       CAST(DAY(o_orderdate) AS BIGINT) AS o_day,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS o_quarter,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(EPOCH(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY o_orderkey
"""


@query("q_datetime_fns", oracle=_DATETIME_ORACLE, tags=("scalar",))
def q_datetime_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
            F.month("o_orderdate").cast("long").alias("o_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
            F.quarter("o_orderdate").cast("long").alias("o_quarter"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
            F.datediff(F.lit("2002-01-01").cast("timestamp"), F.col("o_orderdate"))
            .cast("long")
            .alias("days_to_2002"),
            (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
            F.unix_timestamp(F.col("o_orderdate")).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


# --------------------------------------------------------------------------
# Math functions.
# --------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       ROUND(ABS(l_discount - 0.05), 6) AS abs_disc,
       CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       ROUND(POWER(l_quantity, 2), 6) AS qty_sq,
       ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
       ROUND(EXP(l_discount), 6) AS disc_exp,
       ROUND(LN(l_extendedprice), 6) AS price_ln,
       ROUND(SIGN(l_quantity - 25.0), 1) AS qty_sign,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
FROM lineitem
WHERE l_orderkey < 5000
ORDER BY l_orderkey, l_linenumber
"""


@query("q_math_fns", oracle=_MATH_ORACLE, tags=("scalar",))
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_orderkey") < 5000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
            F.ceil("l_quantity").cast("long").alias("qty_ceil"),
            F.floor("l_extendedprice").cast("long").alias("price_floor"),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
            F.round(F.exp("l_discount"), 6).alias("disc_exp"),
            F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
            F.round(F.signum(F.col("l_quantity") - 25.0), 1).alias("qty_sign"),
            (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# JSON functions on events.props (a JSON string column).
# --------------------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_id,
       CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
       event_type
FROM events
WHERE CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) >= 50
ORDER BY event_id
"""


@query("q_json_fns", oracle=_JSON_ORACLE, tags=("scalar", "json"))
def q_json_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_id", k.alias("k_val"), "event_type")
        .filter(F.col("k_val") >= 50)
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Map functions (create_map, map_keys, map_values, element_at) — outputs
# scalarized for engine-neutral hashing.
# --------------------------------------------------------------------------

_MAP_ORACLE = """
SELECT event_id,
       CAST(CARDINALITY(m) AS BIGINT) AS n_keys,
       ARRAY_TO_STRING(LIST_SORT(MAP_KEYS(m)), ',') AS keys_sorted,
       ARRAY_TO_STRING(LIST_SORT(MAP_VALUES(m)), ',') AS vals_sorted,
       m['type'][1] AS type_val,
       m['user'][1] AS user_val
FROM (
  SELECT event_id,
         MAP(['type', 'user'], [event_type, CAST(user_id AS VARCHAR)]) AS m
  FROM events WHERE event_id < 100
) t
ORDER BY event_id
"""


@query("q_map_fns", oracle=_MAP_ORACLE, tags=("scalar", "map"))
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("user"), F.col("user_id").cast("string")
    )
    return (
        e.select("event_id", m.alias("m"))
        .select(
            "event_id",
            F.size("m").cast("long").alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_sorted"),
            F.concat_ws(",", F.array_sort(F.map_values("m"))).alias("vals_sorted"),
            F.element_at("m", "type").alias("type_val"),
            F.element_at("m", "user").alias("user_val"),
        )
        .orderBy("event_id")
    )


# from_json: schema-full JSON parsing (get_json_object covers the
# path-extract form; this is the typed-struct form).

_FROMJSON_ORACLE = """
SELECT event_id,
       CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) AS k_typed,
       CAST(JSON_EXTRACT(props, '$.k') AS BIGINT) * 2 AS k_doubled
FROM events
WHERE event_id < 500
ORDER BY event_id
"""


@query("q_from_json", oracle=_FROMJSON_ORACLE, tags=("scalar", "json"))
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json(F.col("props"), "k long")
    return (
        e.select("event_id", parsed.alias("p"))
        .select(
            "event_id",
            F.col("p.k").alias("k_typed"),
            (F.col("p.k") * 2).alias("k_doubled"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# NULL handling: coalesce / nullif / null predicates.
# --------------------------------------------------------------------------

_NULL_ORACLE = """
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END AS pos_bal,
       COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END, 0.0) AS bal_or_zero,
       CAST(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END AS BIGINT) AS is_negative
FROM customer
ORDER BY c_custkey
"""


@query("q_null_handling", oracle=_NULL_ORACLE, tags=("scalar",))
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    pos_bal = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2))
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        pos_bal.alias("pos_bal"),
        F.coalesce(pos_bal, F.lit(0.0)).alias("bal_or_zero"),
        F.when(F.col("c_acctbal") < 0, 1).otherwise(0).cast("long").alias("is_negative"),
    ).orderBy("c_custkey")


# --------------------------------------------------------------------------
# Array functions + higher-order functions over split tokens.
# Output is scalarized (counts/joins) so hashing is engine-neutral.
# --------------------------------------------------------------------------

_ARRAY_ORACLE = """
SELECT doc_id,
       CAST(LEN(STRING_SPLIT(TRIM(text), ' ')) AS BIGINT) AS n_tokens,
       CAST(LEN(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))) AS BIGINT) AS n_distinct,
       STRING_SPLIT(TRIM(text), ' ')[1] AS first_tok,
       CASE WHEN LIST_CONTAINS(STRING_SPLIT(TRIM(text), ' '), 'spark') THEN 1 ELSE 0 END AS has_spark,
       ARRAY_TO_STRING(LIST_SLICE(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(TRIM(text), ' '))), 1, 3), ',') AS top3_sorted,
       CAST(LEN(LIST_FILTER(STRING_SPLIT(TRIM(text), ' '), t -> LENGTH(t) > 4)) AS BIGINT) AS n_long_tokens
FROM documents
ORDER BY doc_id
"""


@query("q_array_fns", oracle=_ARRAY_ORACLE, tags=("scalar", "array"))
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " ")
    dtoks = F.array_distinct(toks)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(dtoks).cast("long").alias("n_distinct"),
        F.element_at(toks, 1).alias("first_tok"),
        F.when(F.array_contains(toks, "spark"), 1).otherwise(0).alias("has_spark"),
        F.concat_ws(",", F.slice(F.array_sort(dtoks), 1, 3)).alias("top3_sorted"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long_tokens"),
    ).orderBy("doc_id")


# Array set operations: intersect / union / overlap between document
# token sets and a fixed keyword list (canonicalized to strings).

_ARRSET_ORACLE = """
SELECT doc_id,
       COALESCE(ARRAY_TO_STRING(
         LIST_SORT(LIST_INTERSECT(toks, ['scan', 'join', 'filter', 'sort'])), ','), '')
         AS kw_hits,
       CAST(LEN(LIST_DISTINCT(LIST_CONCAT(toks, ['scan', 'join', 'filter', 'sort']))) AS BIGINT)
         AS union_size,
       CASE WHEN LIST_HAS_ANY(toks, ['scan', 'join', 'filter', 'sort']) THEN 1 ELSE 0 END
         AS has_kw
FROM (SELECT doc_id, LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS toks
      FROM documents) t
ORDER BY doc_id
"""


@query("q_array_setops", oracle=_ARRSET_ORACLE, tags=("scalar", "array"))
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kw = F.array(*[F.lit(w) for w in ("scan", "join", "filter", "sort")])
    toks = F.array_distinct(F.split(F.trim("text"), r"\s+"))
    staged = d.select("doc_id", toks.alias("toks"))
    return staged.select(
        "doc_id",
        F.concat_ws(",", F.array_sort(F.array_intersect(F.col("toks"), kw))).alias("kw_hits"),
        F.size(F.array_distinct(F.array_union(F.col("toks"), kw))).cast("long").alias(
            "union_size"
        ),
        F.when(F.arrays_overlap(F.col("toks"), kw), 1).otherwise(0).alias("has_kw"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# Higher-order aggregate/transform over the embedding array column.
# --------------------------------------------------------------------------

_HOF_ORACLE = """
SELECT vec_id,
       ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE))), 6) AS coord_sum,
       ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS coord_max,
       CAST(LEN(LIST_FILTER(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
ORDER BY vec_id
"""


@query("q_higher_order_fns", oracle=_HOF_ORACLE, tags=("scalar", "array"))
def q_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x), 6).alias("coord_sum"),
        F.round(F.array_max(F.col("embedding")).cast("double"), 6).alias("coord_max"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_positive"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Set operations + deterministic dedup-by-key.
# --------------------------------------------------------------------------

_UNION_ORACLE = """
SELECT nk FROM (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk FROM customer WHERE c_acctbal > 9000
  UNION
  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier WHERE s_acctbal > 5000
) t ORDER BY nk
"""


@query("q_union_distinct", oracle=_UNION_ORACLE, tags=("setop",))
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_acctbal") > 9000).select(F.col("c_nationkey").cast("long").alias("nk"))
    b = s.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").cast("long").alias("nk"))
    return a.unionByName(b).distinct().orderBy("nk")


_INTERSECT_ORACLE = """
SELECT nk FROM (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
) t ORDER BY nk
"""


@query("q_intersect", oracle=_INTERSECT_ORACLE, tags=("setop",))
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").cast("long").alias("nk")
    )
    b = s.select(F.col("s_nationkey").cast("long").alias("nk"))
    return a.intersect(b).orderBy("nk")


_EXCEPT_ORACLE = """
SELECT nk FROM (
  SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nk FROM customer
  EXCEPT
  SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nk FROM supplier
) t ORDER BY nk
"""


@query("q_except", oracle=_EXCEPT_ORACLE, tags=("setop",))
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a = c.select(F.col("c_nationkey").cast("long").alias("nk"))
    b = s.select(F.col("s_nationkey").cast("long").alias("nk"))
    return a.subtract(b).orderBy("nk")


# Multiset set-ops: EXCEPT ALL / INTERSECT ALL (bag semantics — duplicate
# counts matter, unlike the distinct variants above).

_EXCEPTALL_ORACLE = """
SELECT pr FROM (
  SELECT CAST(o_orderpriority AS VARCHAR) AS pr FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT CAST(o_orderpriority AS VARCHAR) AS pr FROM orders WHERE o_orderstatus = 'F'
) t ORDER BY pr
"""


@query("q_except_all", oracle=_EXCEPTALL_ORACLE, tags=("setop",))
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("pr"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("pr"))
    return a.exceptAll(b).orderBy("pr")


_INTERSECTALL_ORACLE = """
SELECT pr FROM (
  SELECT CAST(o_orderpriority AS VARCHAR) AS pr FROM orders WHERE o_orderstatus = 'O'
  INTERSECT ALL
  SELECT CAST(o_orderpriority AS VARCHAR) AS pr FROM orders WHERE o_orderstatus = 'F'
) t ORDER BY pr
"""


@query("q_intersect_all", oracle=_INTERSECTALL_ORACLE, tags=("setop",))
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_orderpriority").alias("pr"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_orderpriority").alias("pr"))
    return a.intersectAll(b).orderBy("pr")


# Deterministic dedup-by-key: keep the row with min sort key per group
# (dropDuplicates is nondeterministic under parallelism → use window
# row_number, ties broken by the unique line number; SURVEY §2.2).

_DEDUP_KEY_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity FROM (
  SELECT l_orderkey, l_linenumber, l_quantity,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
  FROM lineitem
) t WHERE rn = 1
ORDER BY l_orderkey
"""


@query("q_dedup_by_key", oracle=_DEDUP_KEY_ORACLE, tags=("setop", "dedup"))
def q_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    l = load(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data — the
    # full sort key makes the kept row deterministic.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return (
        l.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey")
    )


# Variant (semi-structured) type — Spark 4's parse_json → VARIANT with
# typed variant_get extraction (the modern path for JSON columns at
# scale: parse once into a binary-encoded variant, extract many times
# without re-parsing). Oracle: DuckDB's native JSON extraction. Spec:
# rspl has no JSON surface; north-star closure over the engine's column
# types (SURVEY.md §2.3).

_VARIANT_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE CAST(props->>'k' AS BIGINT) >= 10
GROUP BY event_type
ORDER BY event_type
"""


@query("q_variant_json", oracle=_VARIANT_ORACLE, tags=("scalar", "json", "variant"))
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k") >= 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
