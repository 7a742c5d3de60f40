"""Cross-engine query fuzzer: seeded random project/filter/agg queries
generated from a small grammar, executed on Spark AND DuckDB over the
same parquet, results hash-compared. Catches semantic drift the
hand-written oracle queries don't reach.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # fuzz/streaming/scale tier: pytest -m "not slow" skips
from pyspark.sql import functions as F

from rspl_spark.catalog import load

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey"]
STR_COLS = ["l_returnflag", "l_linestatus"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _gen_query(rng: random.Random):
    """Returns (spark_fn, sql) building one random scan-filter-agg."""
    preds = []
    sqls = []
    for _ in range(rng.randint(0, 3)):
        kind = rng.choice(["num_cmp", "key_mod", "str_eq", "between"])
        if kind == "num_cmp":
            c = rng.choice(NUM_COLS)
            op = rng.choice([">", "<", ">=", "<="])
            v = round(rng.uniform(0, 50), 2)
            preds.append(f"F.col('{c}') {op} {v}")
            sqls.append(f"{c} {op} {v}")
        elif kind == "key_mod":
            c = rng.choice(KEY_COLS)
            m = rng.randint(2, 13)
            r = rng.randint(0, m - 1)
            preds.append(f"F.col('{c}') % {m} == {r}")
            sqls.append(f"{c} % {m} = {r}")
        elif kind == "str_eq":
            c = rng.choice(STR_COLS)
            v = rng.choice(["A", "N", "R"] if c == "l_returnflag" else ["O", "F"])
            preds.append(f"F.col('{c}') == '{v}'")
            sqls.append(f"{c} = '{v}'")
        else:
            c = rng.choice(NUM_COLS)
            lo = round(rng.uniform(0, 20), 2)
            hi = round(lo + rng.uniform(0, 30), 2)
            preds.append(f"F.col('{c}').between({lo}, {hi})")
            sqls.append(f"{c} BETWEEN {lo} AND {hi}")

    group = rng.choice([None, "l_returnflag", "l_linestatus"])
    agg_col = rng.choice(NUM_COLS)
    agg_kind = rng.choice(["sum", "avg", "min", "max", "count"])

    def spark_fn(spark):
        df = load(spark, SF, "lineitem")
        for p in preds:
            df = df.filter(eval(p))  # noqa: S307 — test-local grammar
        aggs = [F.count(F.lit(1)).alias("cnt")]
        if agg_kind == "sum":
            aggs.append(F.round(F.sum(agg_col), 4).alias("a"))
        elif agg_kind == "avg":
            aggs.append(F.round(F.avg(agg_col), 6).alias("a"))
        elif agg_kind == "min":
            aggs.append(F.round(F.min(agg_col), 6).alias("a"))
        elif agg_kind == "max":
            aggs.append(F.round(F.max(agg_col), 6).alias("a"))
        else:
            aggs.append(F.count(agg_col).alias("a"))
        if group:
            return df.groupBy(group).agg(*aggs)
        return df.agg(*aggs)

    where = (" WHERE " + " AND ".join(sqls)) if sqls else ""
    if agg_kind == "sum":
        a = f"ROUND(SUM({agg_col}), 4)"
    elif agg_kind == "avg":
        a = f"ROUND(AVG({agg_col}), 6)"
    elif agg_kind in ("min", "max"):
        a = f"ROUND({agg_kind.upper()}({agg_col}), 6)"
    else:
        a = f"COUNT({agg_col})"
    if group:
        sql = (
            f"SELECT {group}, COUNT(*) AS cnt, {a} AS a FROM lineitem{where} "
            f"GROUP BY {group}"
        )
    else:
        sql = f"SELECT COUNT(*) AS cnt, {a} AS a FROM lineitem{where}"
    return spark_fn, sql


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{SF}/lineitem.parquet'")
    return con


def test_fuzz_30_random_queries(spark, duck):
    rng = random.Random(20260813)
    failures = []
    for i in range(30):
        spark_fn, sql = _gen_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"fuzz mismatches: {failures}"


def _gen_join_query(rng: random.Random):
    """Random orders⋈customer join with filters + group-agg."""
    how = rng.choice(["inner", "left"])
    cust_pred = rng.choice(
        [None, ("c_acctbal", ">", round(rng.uniform(-500, 8000), 2))]
    )
    ord_pred = rng.choice(
        [None, ("o_totalprice", "<", round(rng.uniform(50000, 450000), 2))]
    )
    group = rng.choice(["c_mktsegment", "o_orderpriority", "c_nationkey"])

    def spark_fn(spark):
        c = load(spark, SF, "customer")
        o = load(spark, SF, "orders")
        if cust_pred:
            col, op, v = cust_pred
            c = c.filter(F.col(col) > v if op == ">" else F.col(col) < v)
        if ord_pred:
            col, op, v = ord_pred
            o = o.filter(F.col(col) < v)
        if how == "inner":
            j = o.join(c, o.o_custkey == c.c_custkey)
        else:
            j = c.join(o, o.o_custkey == c.c_custkey, "left")
        return j.groupBy(F.col(group).cast("string").alias("g")).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("a"),
        )

    cw = f" AND c_acctbal > {cust_pred[2]}" if cust_pred else ""
    ow = f" AND o_totalprice < {ord_pred[2]}" if ord_pred else ""
    if how == "inner":
        frm = (
            f"orders JOIN customer ON o_custkey = c_custkey"
            f"{cw.replace(' AND', ' AND', 1)}{ow}"
        )
        sql = (
            f"SELECT CAST({group} AS VARCHAR) AS g, COUNT(*) AS cnt, "
            f"ROUND(COALESCE(SUM(o_totalprice), 0.0), 4) AS a "
            f"FROM orders JOIN customer ON o_custkey = c_custkey"
            f"{(' WHERE 1=1' + cw + ow) if (cw or ow) else ''} GROUP BY {group}"
        )
    else:
        on = f"o_custkey = c_custkey{ow}"
        where = f" WHERE 1=1{cw}" if cw else ""
        sql = (
            f"SELECT CAST({group} AS VARCHAR) AS g, COUNT(*) AS cnt, "
            f"ROUND(COALESCE(SUM(o_totalprice), 0.0), 4) AS a "
            f"FROM customer LEFT JOIN orders ON {on}{where} GROUP BY {group}"
        )
    return spark_fn, sql


def test_fuzz_join_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS customer AS SELECT * FROM '{SF}/customer.parquet'")
    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(424242)
    failures = []
    for i in range(15):
        spark_fn, sql = _gen_join_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"join fuzz mismatches: {failures}"


def _gen_window_query(rng: random.Random):
    fn = rng.choice(["row_number", "rank", "sum", "lag"])
    part = rng.choice(["o_orderpriority", "o_orderstatus"])

    def spark_fn(spark):
        from pyspark.sql.window import Window

        o = load(spark, SF, "orders")
        w = Window.partitionBy(part).orderBy("o_orderdate", "o_orderkey")
        if fn == "row_number":
            c = F.row_number().over(w)
        elif fn == "rank":
            c = F.rank().over(Window.partitionBy(part).orderBy("o_orderdate"))
        elif fn == "sum":
            c = F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                4,
            )
        else:
            c = F.round(F.lag("o_totalprice", 1).over(w), 4)
        return o.select("o_orderkey", c.cast("double").alias("x"))

    if fn == "row_number":
        expr = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY o_orderdate, o_orderkey)"
    elif fn == "rank":
        expr = f"RANK() OVER (PARTITION BY {part} ORDER BY o_orderdate)"
    elif fn == "sum":
        expr = (
            f"ROUND(SUM(o_totalprice) OVER (PARTITION BY {part} "
            f"ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING "
            f"AND CURRENT ROW), 4)"
        )
    else:
        expr = (
            f"ROUND(LAG(o_totalprice, 1) OVER (PARTITION BY {part} "
            f"ORDER BY o_orderdate, o_orderkey), 4)"
        )
    sql = f"SELECT o_orderkey, CAST({expr} AS DOUBLE) AS x FROM orders"
    return spark_fn, sql


def _gen_array_query(rng: random.Random):
    """Random array-function pipelines over split document tokens."""
    op = rng.choice(["size", "contains", "slice_join", "distinct_size"])
    word = rng.choice(["the", "data", "spark", "row", "table", "scan"])
    lo = rng.randint(1, 3)
    ln = rng.randint(1, 4)

    def spark_fn(spark):
        d = load(spark, SF, "documents")
        toks = F.split(F.trim("text"), r"\s+")
        if op == "size":
            x = F.size(toks).cast("long")
        elif op == "contains":
            x = F.when(F.array_contains(toks, word), 1).otherwise(0).cast("long")
        elif op == "slice_join":
            x = F.concat_ws("-", F.slice(toks, lo, ln))
        else:
            x = F.size(F.array_distinct(toks)).cast("long")
        return d.select("doc_id", x.cast("string").alias("x"))

    base = "STRING_SPLIT_REGEX(TRIM(text), '\\s+')"
    if op == "size":
        e = f"CAST(LEN({base}) AS BIGINT)"
    elif op == "contains":
        e = f"CAST(CASE WHEN LIST_CONTAINS({base}, '{word}') THEN 1 ELSE 0 END AS BIGINT)"
    elif op == "slice_join":
        e = f"ARRAY_TO_STRING(LIST_SLICE({base}, {lo}, {lo + ln - 1}), '-')"
    else:
        e = f"CAST(LEN(LIST_DISTINCT({base})) AS BIGINT)"
    sql = f"SELECT doc_id, CAST({e} AS VARCHAR) AS x FROM documents"
    return spark_fn, sql


def test_fuzz_array_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS documents AS SELECT * FROM '{SF}/documents.parquet'")
    rng = random.Random(55555)
    failures = []
    for i in range(10):
        spark_fn, sql = _gen_array_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"array fuzz mismatches: {failures}"


def _gen_date_query(rng: random.Random):
    """Random date-part filters + extraction over orders."""
    part_s, part_d = rng.choice(
        [("year", "YEAR"), ("month", "MONTH"), ("dayofmonth", "DAY"), ("quarter", "QUARTER")]
    )
    yr = rng.randint(1995, 2001)
    agg = rng.choice(["count", "sum"])

    def spark_fn(spark):
        o = load(spark, SF, "orders")
        extract = getattr(F, part_s)("o_orderdate").cast("long")
        base = o.filter(F.year("o_orderdate") == yr)
        g = base.groupBy(extract.alias("p"))
        if agg == "count":
            return g.agg(F.count(F.lit(1)).alias("a"))
        return g.agg(F.round(F.sum("o_totalprice"), 4).alias("a"))

    a = "COUNT(*)" if agg == "count" else "ROUND(SUM(o_totalprice), 4)"
    sql = (
        f"SELECT CAST({part_d}(o_orderdate) AS BIGINT) AS p, {a} AS a "
        f"FROM orders WHERE YEAR(o_orderdate) = {yr} GROUP BY p"
    )
    return spark_fn, sql


def test_fuzz_date_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(99999)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_date_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"date fuzz mismatches: {failures}"


def _gen_string_query(rng: random.Random):
    """Random string-expression pipelines over part names."""
    fn = rng.choice(["upper", "lower", "substr", "replace", "concat", "length"])
    if fn == "substr":
        a = rng.randint(1, 5)
        b = rng.randint(1, 8)
        sexpr, dexpr = f"F.substring('p_name', {a}, {b})", f"SUBSTR(p_name, {a}, {b})"
    elif fn == "replace":
        ch = rng.choice("aeiou")
        sexpr = f"F.replace(F.col('p_name'), F.lit('{ch}'), F.lit('#'))"
        dexpr = f"REPLACE(p_name, '{ch}', '#')"
    elif fn == "concat":
        sexpr = "F.concat(F.col('p_brand'), F.lit('/'), F.upper('p_type'))"
        dexpr = "CONCAT(p_brand, '/', UPPER(p_type))"
    elif fn == "length":
        sexpr = "F.length('p_name').cast('long').cast('string')"
        dexpr = "CAST(CAST(LENGTH(p_name) AS BIGINT) AS VARCHAR)"
    else:
        sexpr = f"F.{fn}('p_name')"
        dexpr = f"{fn.upper()}(p_name)"
    like = rng.choice(["%a%", "%e%", "%ing%", "%o%"])

    def spark_fn(spark):
        p = load(spark, SF, "part")
        return (
            p.filter(F.col("p_name").like(like))
            .select("p_partkey", eval(sexpr).alias("x"))  # noqa: S307
        )

    sql = (
        f"SELECT p_partkey, {dexpr} AS x FROM part WHERE p_name LIKE '{like}'"
    )
    return spark_fn, sql


def test_fuzz_string_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS part AS SELECT * FROM '{SF}/part.parquet'")
    rng = random.Random(31337)
    failures = []
    for i in range(15):
        spark_fn, sql = _gen_string_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"string fuzz mismatches: {failures}"


def _gen_join_chain_query(rng: random.Random):
    """Random 3-table join CHAIN (customer → nation → orders) with
    independently drawn inner/left/full types per hop — exercises
    null-propagation through outer chains, which the 2-table grammar
    can't reach."""
    t1 = rng.choice(["inner", "left", "full"])
    t2 = rng.choice(["inner", "left", "full"])
    ord_cap = rng.choice([None, round(rng.uniform(40000, 400000), 2)])
    nat_mod = rng.choice([None, rng.randint(2, 7)])

    def spark_fn(spark):
        c = load(spark, SF, "customer")
        n = load(spark, SF, "nation")
        o = load(spark, SF, "orders")
        if nat_mod:
            n = n.filter(F.col("n_nationkey") % nat_mod == 0)
        if ord_cap:
            o = o.filter(F.col("o_totalprice") < ord_cap)
        j = c.join(n, F.col("c_nationkey") == F.col("n_nationkey"), t1)
        j = j.join(o, F.col("o_custkey") == F.col("c_custkey"), t2)
        return j.groupBy(
            F.coalesce(F.col("n_name"), F.lit("∅")).alias("g")
        ).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.count("o_orderkey").alias("n_ord"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("a"),
        )

    nat = (
        f"(SELECT * FROM nation WHERE n_nationkey % {nat_mod} = 0) nation"
        if nat_mod
        else "nation"
    )
    ords = (
        f"(SELECT * FROM orders WHERE o_totalprice < {ord_cap}) orders"
        if ord_cap
        else "orders"
    )
    jw = {"inner": "JOIN", "left": "LEFT JOIN", "full": "FULL JOIN"}
    sql = (
        f"SELECT COALESCE(n_name, '∅') AS g, COUNT(*) AS cnt, "
        f"COUNT(o_orderkey) AS n_ord, "
        f"ROUND(COALESCE(SUM(o_totalprice), 0.0), 4) AS a "
        f"FROM customer {jw[t1]} {nat} ON c_nationkey = n_nationkey "
        f"{jw[t2]} {ords} ON o_custkey = c_custkey "
        f"GROUP BY COALESCE(n_name, '∅')"
    )
    return spark_fn, sql


def test_fuzz_join_chain_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS customer AS SELECT * FROM '{SF}/customer.parquet'")
    duck.sql(f"CREATE VIEW IF NOT EXISTS nation AS SELECT * FROM '{SF}/nation.parquet'")
    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(8675309)
    failures = []
    for i in range(15):
        spark_fn, sql = _gen_join_chain_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"join-chain fuzz mismatches: {failures}"


def _gen_frame_query(rng: random.Random):
    """Random explicit ROWS/RANGE window frames with drawn bounds — the
    frame arithmetic (peer rows under RANGE, offset rows under ROWS) is
    where engines drift."""
    from pyspark.sql.window import Window

    mode = rng.choice(["rows", "range"])
    part = rng.choice([None, "o_orderpriority", "o_orderstatus"])
    agg_s, agg_d = rng.choice(
        [("sum", "SUM"), ("min", "MIN"), ("max", "MAX"), ("count", "COUNT"), ("avg", "AVG")]
    )
    if mode == "rows":
        lo = rng.choice([Window.unboundedPreceding, -rng.randint(0, 5)])
        hi = rng.choice([Window.currentRow, rng.randint(0, 5)])
        lo_d = "UNBOUNDED PRECEDING" if lo == Window.unboundedPreceding else f"{-lo} PRECEDING"
        hi_d = "CURRENT ROW" if hi == Window.currentRow else f"{hi} FOLLOWING"
        frame_d = f"ROWS BETWEEN {lo_d} AND {hi_d}"
        order_s, order_d = ["o_orderdate", "o_orderkey"], "o_orderdate, o_orderkey"
    else:
        lo, hi = -rng.randint(0, 400), rng.randint(0, 400)
        frame_d = f"RANGE BETWEEN {-lo} PRECEDING AND {hi} FOLLOWING"
        order_s, order_d = ["o_custkey"], "o_custkey"

    def spark_fn(spark):
        o = load(spark, SF, "orders")
        w = Window.orderBy(*order_s)
        if part:
            w = Window.partitionBy(part).orderBy(*order_s)
        w = w.rowsBetween(lo, hi) if mode == "rows" else w.rangeBetween(lo, hi)
        src = F.lit(1) if agg_s == "count" else F.col("o_totalprice")
        c = getattr(F, agg_s)(src).over(w)
        return o.select("o_orderkey", c.cast("double").alias("x"))

    pb = f"PARTITION BY {part} " if part else ""
    src_d = "*" if agg_d == "COUNT" else "o_totalprice"
    expr = f"{agg_d}({src_d}) OVER ({pb}ORDER BY {order_d} {frame_d})"
    sql = f"SELECT o_orderkey, CAST({expr} AS DOUBLE) AS x FROM orders"
    return spark_fn, sql


def test_fuzz_frame_queries(spark, duck):
    """Frame sums/avgs accumulate in engine-specific order, so agreement
    is to float tolerance (observed drift ≤ 3e-10 relative), not exact
    post-ROUND strings — key-aligned isclose instead of _canon."""
    import numpy as np

    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(271828)
    failures = []
    for i in range(15):
        spark_fn, sql = _gen_frame_query(rng)
        sdf = spark_fn(spark).toPandas().set_index("o_orderkey").sort_index()
        ddf = duck.sql(sql).df().set_index("o_orderkey").sort_index()
        if len(sdf) != len(ddf) or not np.allclose(
            sdf["x"].to_numpy(dtype=float),
            ddf["x"].to_numpy(dtype=float),
            rtol=1e-8,
            atol=1e-6,
            equal_nan=True,
        ):
            failures.append((i, sql))
    assert not failures, f"frame fuzz mismatches: {failures}"


def _gen_exists_query(rng: random.Random):
    """Random correlated [NOT] EXISTS over orders→lineitem — the oracle
    keeps the literal correlated-subquery form, the Spark side uses the
    decorrelated semi/anti join (the at-scale formulation everywhere in
    this repo)."""
    negate = rng.random() < 0.5
    c = rng.choice(["l_quantity", "l_extendedprice", "l_discount"])
    op = rng.choice([">", "<"])
    v = {
        "l_quantity": round(rng.uniform(1, 50), 1),
        "l_extendedprice": round(rng.uniform(1000, 80000), 2),
        "l_discount": round(rng.uniform(0.0, 0.1), 3),
    }[c]
    group = rng.choice(["o_orderpriority", "o_orderstatus"])

    def spark_fn(spark):
        o = load(spark, SF, "orders")
        li = load(spark, SF, "lineitem").filter(
            F.col(c) > v if op == ">" else F.col(c) < v
        )
        how = "left_anti" if negate else "left_semi"
        j = o.join(li, o.o_orderkey == li.l_orderkey, how)
        return j.groupBy(group).agg(F.count(F.lit(1)).alias("cnt"))

    kw = "NOT EXISTS" if negate else "EXISTS"
    sql = (
        f"SELECT {group}, COUNT(*) AS cnt FROM orders "
        f"WHERE {kw} (SELECT 1 FROM lineitem "
        f"WHERE l_orderkey = o_orderkey AND {c} {op} {v}) "
        f"GROUP BY {group}"
    )
    return spark_fn, sql


def test_fuzz_exists_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(13579)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_exists_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"exists fuzz mismatches: {failures}"


def test_fuzz_window_queries(spark, duck):
    duck.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM '{SF}/orders.parquet'")
    rng = random.Random(777)
    failures = []
    for i in range(10):
        spark_fn, sql = _gen_window_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"window fuzz mismatches: {failures}"


def _gen_hof_query(rng: random.Random):
    """Random higher-order-function pipelines: filter-by-length →
    transform-to-length → fold/max/count/join — the lambda-expression
    surface (grammar #10)."""
    min_len = rng.randint(1, 5)
    do_filter = rng.random() < 0.7
    readout = rng.choice(["sum_len", "max_len", "cnt", "joined"])
    k = rng.randint(2, 5)

    def spark_fn(spark):
        d = load(spark, SF, "documents")
        toks = F.split(F.trim("text"), r"\s+")
        if do_filter:
            toks = F.filter(toks, lambda x: F.length(x) >= min_len)
        if readout == "sum_len":
            x = F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
        elif readout == "max_len":
            x = F.array_max(F.transform(toks, lambda x: F.length(x).cast("long")))
        elif readout == "cnt":
            x = F.size(toks).cast("long")
        else:
            x = F.concat_ws("|", F.slice(toks, 1, k))
        return d.select("doc_id", x.cast("string").alias("x"))

    base = "STRING_SPLIT_REGEX(TRIM(text), '\\s+')"
    if do_filter:
        base = f"LIST_FILTER({base}, x -> LENGTH(x) >= {min_len})"
    if readout == "sum_len":
        e = f"CAST(COALESCE(LIST_SUM(LIST_TRANSFORM({base}, x -> LENGTH(x))), 0) AS BIGINT)"
    elif readout == "max_len":
        e = f"CAST(LIST_MAX(LIST_TRANSFORM({base}, x -> LENGTH(x))) AS BIGINT)"
    elif readout == "cnt":
        e = f"CAST(LEN({base}) AS BIGINT)"
    else:
        e = f"ARRAY_TO_STRING(LIST_SLICE({base}, 1, {k}), '|')"
    sql = f"SELECT doc_id, CAST({e} AS VARCHAR) AS x FROM documents"
    return spark_fn, sql


def test_fuzz_hof_queries(spark, duck):
    duck.sql(
        f"CREATE VIEW IF NOT EXISTS documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    rng = random.Random(101010)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_hof_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"hof fuzz mismatches: {failures}"


def _gen_setop_query(rng: random.Random):
    """Random parenthesized set-op chains over filtered low-cardinality
    projections of lineitem (grammar #11): UNION/INTERSECT/EXCEPT with
    and without ALL, left-folded on both engines. Multiset (ALL)
    semantics are the interesting part — duplicates survive or cancel
    per-occurrence, which single-example gates barely exercise."""
    m = rng.randint(2, 5)
    cols_spark = ["l_returnflag", "l_linestatus"]
    proj_sql = f"l_returnflag, l_linestatus, l_orderkey % {m} AS k"

    def leg():
        kind = rng.choice(["flag", "status", "qty", "none"])
        if kind == "flag":
            v = rng.choice(["A", "N", "R"])
            return f"l_returnflag = '{v}'", lambda df: df.filter(F.col("l_returnflag") == v)
        if kind == "status":
            v = rng.choice(["O", "F"])
            return f"l_linestatus = '{v}'", lambda df: df.filter(F.col("l_linestatus") == v)
        if kind == "qty":
            v = rng.randint(5, 45)
            return f"l_quantity > {v}", lambda df: df.filter(F.col("l_quantity") > v)
        return "1 = 1", lambda df: df

    n_legs = rng.randint(2, 3)
    legs = [leg() for _ in range(n_legs)]
    ops = [
        rng.choice(
            ["UNION ALL", "UNION", "INTERSECT ALL", "INTERSECT", "EXCEPT ALL", "EXCEPT"]
        )
        for _ in range(n_legs - 1)
    ]

    def spark_fn(spark):
        li = load(spark, SF, "lineitem")

        def one(flt):
            return flt(li).select(
                *cols_spark, (F.col("l_orderkey") % m).alias("k")
            )

        acc = one(legs[0][1])
        for op, (_, flt) in zip(ops, legs[1:]):
            nxt = one(flt)
            if op == "UNION ALL":
                acc = acc.union(nxt)
            elif op == "UNION":
                acc = acc.union(nxt).distinct()
            elif op == "INTERSECT ALL":
                acc = acc.intersectAll(nxt)
            elif op == "INTERSECT":
                acc = acc.intersect(nxt)
            elif op == "EXCEPT ALL":
                acc = acc.exceptAll(nxt)
            else:
                acc = acc.subtract(nxt)
        return acc.groupBy("l_returnflag", "l_linestatus", "k").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )

    sql = f"(SELECT {proj_sql} FROM lineitem WHERE {legs[0][0]})"
    for op, (pred, _) in zip(ops, legs[1:]):
        sql = f"({sql} {op} (SELECT {proj_sql} FROM lineitem WHERE {pred}))"
    sql = (
        "SELECT l_returnflag, l_linestatus, k, CAST(COUNT(*) AS BIGINT) AS cnt "
        f"FROM {sql} t GROUP BY 1, 2, 3"
    )
    return spark_fn, sql


def test_fuzz_setop_queries(spark, duck):
    rng = random.Random(111111)
    failures = []
    for i in range(15):
        spark_fn, sql = _gen_setop_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"set-op fuzz mismatches: {failures}"


def _gen_pivot_roundtrip_query(rng: random.Random):
    """Pivot → unpivot round-trips (grammar #12): groupBy A pivot B
    agg(num) then unpivot back and drop empty cells must equal the flat
    GROUP BY A, B aggregate — checked against DuckDB computing the flat
    form directly. Exercises explicit pivot value lists, cell NULL
    semantics, and unpivot column naming in one property."""
    id_col, pv_col, pv_vals = rng.choice(
        [
            ("l_returnflag", "l_linestatus", ["F", "O"]),
            ("l_linestatus", "l_returnflag", ["A", "N", "R"]),
        ]
    )
    agg_col = rng.choice(NUM_COLS)
    agg_kind = rng.choice(["sum", "count", "max"])
    q = rng.randint(0, 40)

    def spark_fn(spark):
        li = load(spark, SF, "lineitem").filter(F.col("l_quantity") > q)
        if agg_kind == "sum":
            a = F.round(F.sum(agg_col), 4)
        elif agg_kind == "max":
            a = F.round(F.max(agg_col), 6)
        else:
            a = F.count(agg_col).cast("double")
        wide = li.groupBy(id_col).pivot(pv_col, pv_vals).agg(a.alias("v"))
        return (
            wide.unpivot([id_col], pv_vals, "pv", "val")
            .filter(F.col("val").isNotNull())
            .select(id_col, "pv", F.col("val").cast("double").alias("val"))
        )

    if agg_kind == "sum":
        a = f"ROUND(SUM({agg_col}), 4)"
    elif agg_kind == "max":
        a = f"ROUND(MAX({agg_col}), 6)"
    else:
        a = f"CAST(COUNT({agg_col}) AS DOUBLE)"
    sql = (
        f"SELECT {id_col}, {pv_col} AS pv, CAST({a} AS DOUBLE) AS val "
        f"FROM lineitem WHERE l_quantity > {q} GROUP BY 1, 2"
    )
    return spark_fn, sql


def test_fuzz_pivot_roundtrip_queries(spark, duck):
    rng = random.Random(121212)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_pivot_roundtrip_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"pivot round-trip fuzz mismatches: {failures}"


def _gen_sketch_query(rng: random.Random):
    """Randomized sketch configs (grammar #13): HLL with varying
    register count p and grouping, and histogram quantiles with varying
    bin count / quantile set / grouping — the gates pin ONE config each;
    this walks the parameter space against the same SQL mirrors."""
    kind = rng.choice(["hll", "hist"])
    grp = rng.choice([(), ("l_returnflag",), ("l_linestatus",)])
    if kind == "hll":
        from rspl_spark.operators.sketches import hll_estimate, hll_registers, hll_sql

        p = rng.choice([6, 8, 10, 12])
        key = rng.choice(["l_extendedprice", "l_partkey", "l_orderkey"])

        def spark_fn(spark):
            li = load(spark, SF, "lineitem")
            out = hll_estimate(hll_registers(li, key, grp, p=p), grp, p=p)
            return out.orderBy(*grp) if grp else out

        gsel = "".join(f"{g}, " for g in grp)
        sql = (
            f"WITH {hll_sql('lineitem', key, grp, p=p)} "
            f"SELECT {gsel}approx_distinct FROM hest"
            + (f" ORDER BY {', '.join(grp)}" if grp else "")
        )
        return spark_fn, sql
    from rspl_spark.operators.sketches import hist_quantiles, hist_quantiles_sql

    nbins = rng.choice([16, 64, 100, 256])
    qs = tuple(sorted(rng.sample([0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99], rng.randint(1, 3))))
    col = rng.choice(["l_extendedprice", "l_quantity"])

    def spark_fn(spark):
        li = load(spark, SF, "lineitem")
        return hist_quantiles(li, col, qs, grp, nbins=nbins).orderBy(*grp, "q")

    gsel = "".join(f"{g}, " for g in grp)
    order = ", ".join(list(grp) + ["q"])
    sql = (
        f"WITH {hist_quantiles_sql('lineitem', col, qs, grp, nbins=nbins)} "
        f"SELECT {gsel}q, est FROM hq ORDER BY {order}"
    )
    return spark_fn, sql


def test_fuzz_sketch_queries(spark, duck):
    rng = random.Random(131313)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_sketch_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql[:160]))
    assert not failures, f"sketch fuzz mismatches: {failures}"


def _gen_scalar_subquery_query(rng: random.Random):
    """Grammar #14: random correlated SCALAR-aggregate subqueries — the
    Q2/Q11/Q17/Q20 family. The oracle keeps the literal correlated
    form (per-group MIN/MAX/AVG compared against each row); the Spark
    side decorrelates into a window aggregate over the same partition
    (the at-scale formulation used by q2_min_cost_supplier). The
    fuzzed aggregate is restricted to MIN/MAX: both are exact and
    order-insensitive, so the raw-double comparison flag is
    engine-identical. AVG is deliberately excluded — its float
    summation order differs between Spark partials and DuckDB, so
    boundary rows near cmp_frac * AVG could flip under other seeds
    (the repo's established Spark-vs-DuckDB determinism rule)."""
    agg = rng.choice(["MIN", "MAX"])
    c = rng.choice(["l_quantity", "l_extendedprice"])
    part = rng.choice(["l_suppkey", "l_partkey", "l_returnflag"])
    cmp_frac = round(rng.uniform(0.5, 1.5), 2)
    group = rng.choice(["l_returnflag", "l_linestatus"])

    spark_agg = {"MIN": F.min, "MAX": F.max, "AVG": F.avg}[agg]

    def spark_fn(spark):
        li = load(spark, SF, "lineitem")
        from pyspark.sql.window import Window

        w = Window.partitionBy(part)
        flagged = li.withColumn("_t", spark_agg(F.col(c)).over(w)).filter(
            F.col(c) > F.lit(cmp_frac) * F.col("_t")
        )
        return flagged.groupBy(group).agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.sum(F.col("l_quantity")).cast("long").alias("qty"),
        )

    sql = (
        f"SELECT {group}, CAST(COUNT(*) AS BIGINT) AS cnt, "
        f"CAST(SUM(l_quantity) AS BIGINT) AS qty "
        f"FROM lineitem l1 "
        f"WHERE {c} > {cmp_frac} * (SELECT {agg}({c}) FROM lineitem l2 "
        f"WHERE l2.{part} = l1.{part}) "
        f"GROUP BY {group}"
    )
    return spark_fn, sql


def test_fuzz_scalar_subquery_queries(spark, duck):
    duck.sql(
        f"CREATE VIEW IF NOT EXISTS lineitem AS SELECT * FROM '{SF}/lineitem.parquet'"
    )
    rng = random.Random(24680)
    failures = []
    for i in range(12):
        spark_fn, sql = _gen_scalar_subquery_query(rng)
        sdf = _canon(spark_fn(spark).toPandas())
        ddf = _canon(duck.sql(sql).df())
        if not sdf.equals(ddf):
            failures.append((i, sql))
    assert not failures, f"scalar-subquery fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #15: SCD2 change capture on randomized snapshot histories.
# The hand-written q_scd2_* gates run on events (no (key, ts) ties, no
# NULL attributes); this grammar generates exactly those hazards —
# duplicate (key, ts) observations with different attributes (decided
# by the seq tie-break), NULL attribute runs (null-safe "no change"),
# multi-attribute tracking — and replays the build in DuckDB SQL.
# (k, ts, seq) stays unique by construction: a seq tie with different
# attrs would be nondeterministic in BOTH engines, i.e. not a defined
# input.
# ---------------------------------------------------------------------------


def _gen_scd2_history(rng: random.Random, n: int) -> pd.DataFrame:
    rows = []
    for seq in range(n):
        rows.append(
            (
                f"k{rng.randrange(7)}",
                rng.choice(["a", "b", "c", None]),
                rng.choice(["x", "y", None]),
                # coarse ts grid so (key, ts) collisions actually happen
                rng.randrange(25),
                seq,
            )
        )
    return pd.DataFrame(rows, columns=["k", "attr1", "attr2", "ts", "seq"])


_SCD2_FUZZ_SQL = """
WITH snaps AS (
  SELECT k, attr1, attr2, ts FROM (
    SELECT k, attr1, attr2, ts,
           ROW_NUMBER() OVER (PARTITION BY k, ts ORDER BY seq DESC) AS rn
    FROM scd_hist
  ) d WHERE rn = 1
),
flagged AS (
  SELECT k, attr1, attr2, ts,
         LAG(attr1) OVER w AS p1, LAG(attr2) OVER w AS p2,
         LAG(1) OVER w AS seen
  FROM snaps
  WINDOW w AS (PARTITION BY k ORDER BY ts)
),
changes AS (
  SELECT k, attr1, attr2, ts AS valid_from
  FROM flagged
  WHERE seen IS NULL
     OR attr1 IS DISTINCT FROM p1
     OR attr2 IS DISTINCT FROM p2
)
SELECT k, attr1, attr2, valid_from,
       LEAD(valid_from) OVER (PARTITION BY k ORDER BY valid_from) AS valid_to,
       CAST(ROW_NUMBER() OVER (PARTITION BY k ORDER BY valid_from) AS BIGINT) AS version
FROM changes
ORDER BY k, version
"""


def test_fuzz_scd2_change_capture(spark, duck):
    from rspl_spark.operators.scd import scd2_build

    failures = []
    for seed in (7, 99, 2024, 31337, 54321, 987654):
        rng = random.Random(seed)
        hist = _gen_scd2_history(rng, rng.randrange(40, 160))
        duck.register("scd_hist", hist)
        sdf = scd2_build(
            spark.createDataFrame(hist, "k string, attr1 string, attr2 string, ts long, seq long"),
            ["k"],
            ["attr1", "attr2"],
            "ts",
            order_cols=["seq"],
        ).select(
            "k", "attr1", "attr2", "valid_from", "valid_to",
            F.col("version").cast("long").alias("version"),
        )
        got = _canon(sdf.toPandas())
        want = _canon(duck.sql(_SCD2_FUZZ_SQL).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("scd_hist")
    assert not failures, f"scd2 fuzz mismatches at seeds: {failures}"


# ---------------------------------------------------------------------------
# Grammar #16: table_diff on randomized snapshot pairs — random key
# overlap, NULL attribute values on either side, multi-column change
# sets; the DuckDB replay classifies via FULL OUTER + IS DISTINCT FROM.
# ---------------------------------------------------------------------------

_DIFF_FUZZ_SQL = """
SELECT k,
       CASE WHEN o.k IS NULL THEN 'inserted'
            WHEN n.k IS NULL THEN 'deleted'
            WHEN o.v1 IS DISTINCT FROM n.v1 OR o.v2 IS DISTINCT FROM n.v2
              THEN 'changed' ELSE 'unchanged' END AS change_kind,
       COALESCE(CASE WHEN o.k IS NULL OR n.k IS NULL THEN ''
            ELSE ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(['v1', 'v2'],
                   x -> (x = 'v1' AND o.v1 IS DISTINCT FROM n.v1)
                     OR (x = 'v2' AND o.v2 IS DISTINCT FROM n.v2))), '|')
       END, '') AS changed_cols
FROM diff_old o FULL OUTER JOIN diff_new n USING (k)
ORDER BY k
"""


def _gen_snapshot(rng: random.Random, keys) -> pd.DataFrame:
    rows = [
        (k, rng.choice(["a", "b", None]), rng.choice([1.5, 2.5, None]))
        for k in keys
    ]
    return pd.DataFrame(rows, columns=["k", "v1", "v2"])


def test_fuzz_table_diff(spark, duck):
    from rspl_spark.operators.diff import table_diff

    failures = []
    for seed in (3, 41, 512, 7777):
        rng = random.Random(seed)
        universe = list(range(60))
        old = _gen_snapshot(rng, sorted(rng.sample(universe, 40)))
        new = _gen_snapshot(rng, sorted(rng.sample(universe, 40)))
        duck.register("diff_old", old)
        duck.register("diff_new", new)
        schema = "k long, v1 string, v2 double"
        got = _canon(
            table_diff(
                spark.createDataFrame(old, schema),
                spark.createDataFrame(new, schema),
                ["k"],
            )
            .select(
                "k",
                "change_kind",
                F.concat_ws("|", "changed_cols").alias("changed_cols"),
            )
            .toPandas()
        )
        want = _canon(duck.sql(_DIFF_FUZZ_SQL).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("diff_old")
        duck.unregister("diff_new")
    assert not failures, f"table_diff fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #17: winsorize at randomized rational alphas — rank-based
# bounds must match the SQL replay on random (duplicate-heavy) values.
# ---------------------------------------------------------------------------


def _winsorize_fuzz_sql(num: int, den: int) -> str:
    return f"""
WITH ranked AS (
  SELECT g, v,
         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n
  FROM wz
),
keyed AS (
  SELECT g, v, rn,
         (n * {num} + {den - 1}) // {den} AS klo,
         n + 1 - (n * {num} + {den - 1}) // {den} AS khi
  FROM ranked
),
bounds AS (
  SELECT g, MIN(v) AS lo, MAX(v) AS hi FROM keyed
  WHERE rn = klo OR rn = khi GROUP BY g
)
SELECT w.g, w.v,
       ROUND(LEAST(GREATEST(w.v, b.lo), b.hi), 6) AS clipped
FROM wz w JOIN bounds b ON w.g = b.g
ORDER BY w.g, w.v
"""


def test_fuzz_winsorize(spark, duck):
    from rspl_spark.operators.curation import winsorize

    failures = []
    for seed, (num, den) in [(5, (5, 100)), (19, (1, 10)), (23, (25, 100)), (99, (3, 7))]:
        rng = random.Random(seed)
        rows = [
            (rng.choice("pq"), float(rng.choice([1, 2, 2, 3, 5, 8, 13, 21])))
            for _ in range(rng.randrange(30, 90))
        ]
        pdf = pd.DataFrame(rows, columns=["g", "v"])
        duck.register("wz", pdf)
        got = _canon(
            winsorize(
                spark.createDataFrame(pdf, "g string, v double"), "v", ["g"], num, den
            )
            .select("g", "v", F.round("clipped", 6).alias("clipped"))
            .toPandas()
        )
        want = _canon(duck.sql(_winsorize_fuzz_sql(num, den)).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("wz")
    assert not failures, f"winsorize fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #18: rate-anomaly flags on random event streams — the
# double-carried integer z-test must reproduce every flag bit-for-bit
# against the DuckDB replay for random bucket shapes and z values.
# ---------------------------------------------------------------------------


def _rate_fuzz_sql(z: int) -> str:
    return f"""
WITH counts AS (
  SELECT k, b, CAST(COUNT(*) AS BIGINT) AS n FROM ra_events GROUP BY k, b
),
m AS (
  SELECT k, CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS ss
  FROM counts GROUP BY k
)
SELECT c.k, c.b, c.n,
       CAST(CASE WHEN (CAST(m.nb AS DOUBLE) * c.n - m.s)
                      * (CAST(m.nb AS DOUBLE) * c.n - m.s)
                      > {z * z} * (CAST(m.nb AS DOUBLE) * m.ss
                                   - CAST(m.s AS DOUBLE) * m.s)
                 THEN 1 ELSE 0 END AS BIGINT) AS flag
FROM counts c JOIN m ON c.k = m.k
ORDER BY c.k, c.b
"""


def test_fuzz_rate_anomalies(spark, duck):
    import pandas as pd

    from rspl_spark.operators.drift import rate_anomalies

    failures = []
    for seed, z in [(11, 2), (37, 3), (71, 1), (113, 4)]:
        rng = random.Random(seed)
        rows = []
        for _ in range(rng.randrange(200, 600)):
            k = f"k{rng.randrange(4)}"
            minute = rng.randrange(40)
            # heavy-tail: occasional bursts within a minute
            for _ in range(1 if rng.random() > 0.08 else rng.randrange(5, 30)):
                rows.append((k, pd.Timestamp("2024-02-01") + pd.Timedelta(
                    minutes=minute, seconds=rng.randrange(60))))
        pdf = pd.DataFrame(rows, columns=["k", "ts"])
        duck.register(
            "ra_events",
            pdf.assign(b=pdf["ts"].dt.floor("min"))[["k", "b"]],
        )
        got = _canon(
            rate_anomalies(
                spark.createDataFrame(pdf), "ts", ["k"], bucket="minute", z=z
            )
            .select("k", F.col("bucket_ts").alias("b"), "n", "flag")
            .toPandas()
        )
        want = _canon(duck.sql(_rate_fuzz_sql(z)).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("ra_events")
    assert not failures, f"rate-anomaly fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #19: peak concurrency on random interval sets — the parallel
# max-prefix-sum reduction must equal the serial SQL sweep for random
# overlaps, duplicate boundaries, and degenerate/NULL intervals.
# ---------------------------------------------------------------------------

_PEAK_FUZZ_SQL = """
WITH ok AS (SELECT s, e FROM iv WHERE s IS NOT NULL AND e IS NOT NULL AND e > s),
d AS (SELECT s AS t, 1 AS dd FROM ok UNION ALL SELECT e, -1 FROM ok),
p AS (SELECT t, SUM(dd) AS net FROM d GROUP BY t),
r AS (SELECT SUM(net) OVER (ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o
      FROM p)
SELECT CAST(MAX(o) AS BIGINT) AS peak,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ok) AS n_intervals
FROM r
"""


def test_fuzz_peak_concurrency(spark, duck):
    from rspl_spark.operators.intervals import peak_concurrency

    failures = []
    for seed in (2, 29, 307, 1009):
        rng = random.Random(seed)
        rows = []
        for _ in range(rng.randrange(80, 250)):
            s = rng.randrange(100)
            kind = rng.random()
            if kind < 0.05:
                rows.append((None, s))
            elif kind < 0.1:
                rows.append((s, s))  # empty
            else:
                rows.append((s, s + rng.randrange(1, 40)))
        pdf = pd.DataFrame(rows, columns=["s", "e"]).astype("Int64")
        duck.register("iv", pdf)
        got = _canon(
            peak_concurrency(
                spark.createDataFrame(pdf.astype(object).where(pdf.notna(), None),
                                      "s long, e long"),
                "s",
                "e",
            ).toPandas()
        )
        want = _canon(duck.sql(_PEAK_FUZZ_SQL).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("iv")
    assert not failures, f"peak-concurrency fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #20: time-series gap-fill + EWMA on randomized sparse grids —
# the segment-emission gapfill (one lead window + sequence/explode) must
# equal an INDEPENDENT DuckDB spine formulation (bounds → generate_series
# spine → left join → ignore-nulls window fills) for random keys, steps,
# and gap shapes; the window EWMA must equal the LIST-window fold for
# random window widths. (SURVEY §5 finite-prefix discipline;
# reference root: tests/basic.rs:18-22 windowing.)
# ---------------------------------------------------------------------------

_GAPFILL_FUZZ_SQL = """
WITH bounds AS (SELECT k, MIN(bts) AS t0, MAX(bts) AS t1 FROM ts_obs GROUP BY k),
spine AS (
  SELECT k, UNNEST(generate_series(t0, t1, INTERVAL {step})) AS bts FROM bounds
),
grid AS (
  SELECT s.k, s.bts, o.v, (o.k IS NOT NULL) AS observed
  FROM spine s LEFT JOIN ts_obs o ON s.k = o.k AND s.bts = o.bts
),
br AS (
  SELECT k, bts, v, observed,
    LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
    LAST_VALUE(CASE WHEN v IS NOT NULL THEN bts END IGNORE NULLS) OVER wp AS pt,
    FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN bts END IGNORE NULLS) OVER wf AS nt
  FROM grid
  WINDOW wp AS (PARTITION BY k ORDER BY bts ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY k ORDER BY bts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT k, CAST(bts AS TIMESTAMP) AS bts,
  pv AS v_locf,
  CASE WHEN observed THEN v
       WHEN nv IS NULL THEN pv
       WHEN pv IS NULL THEN nv
       ELSE ROUND(pv + (nv - pv) *
            (CAST(EPOCH_US(bts) - EPOCH_US(pt) AS DOUBLE)
             / CAST(EPOCH_US(nt) - EPOCH_US(pt) AS DOUBLE)), 6)
  END AS v_lin,
  CASE WHEN observed THEN v ELSE 0.0 END AS v_zero,
  v AS v_null,
  CAST(NOT observed AS BIGINT) AS is_gap
FROM br
ORDER BY k, bts
"""

_TS_STEPS = [
    ("30 minutes", "30 MINUTE", 1800),
    ("2 hours", "2 HOUR", 7200),
    ("6 hours", "6 HOUR", 21600),
    ("1 days", "1 DAY", 86400),
]


def _random_sparse_obs(rng: random.Random, step_s: int) -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for ki in range(rng.randrange(1, 8)):
        idxs = sorted(rng.sample(range(60), rng.randrange(1, 25)))
        for i in idxs:
            rows.append(
                (f"k{ki}", t0 + pd.Timedelta(seconds=step_s * i),
                 round(rng.uniform(-50, 50), 3))
            )
    return pd.DataFrame(rows, columns=["k", "bts", "v"])


def test_fuzz_gapfill_sparse_grids(spark, duck):
    from rspl_spark.operators.timeseries import gapfill

    failures = []
    for seed in (3, 41, 512, 6007):
        rng = random.Random(seed)
        spark_step, duck_step, step_s = _TS_STEPS[seed % len(_TS_STEPS)]
        pdf = _random_sparse_obs(rng, step_s)
        duck.register("ts_obs", pdf)
        df = spark.createDataFrame(pdf, "k string, bts timestamp, v double")
        wide = (
            df.withColumn("v_locf", F.col("v"))
            .withColumn("v_lin", F.col("v"))
            .withColumn("v_zero", F.col("v"))
            .withColumn("v_null", F.col("v"))
            .drop("v")
        )
        out = gapfill(
            wide,
            ["k"],
            "bts",
            spark_step,
            {"v_locf": "locf", "v_lin": "linear", "v_zero": "zero",
             "v_null": "null"},
        )
        got = _canon(
            out.select(
                "k", "bts", "v_locf", "v_lin", "v_zero", "v_null",
                F.col("is_gap").cast("long").alias("is_gap"),
            ).toPandas()
        )
        want = _canon(duck.sql(_GAPFILL_FUZZ_SQL.format(step=duck_step)).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("ts_obs")
    assert not failures, f"gapfill fuzz mismatches: {failures}"


def _ewma_fuzz_sql(w: int) -> str:
    pw = "[" + ", ".join(repr(2.0 ** -j) for j in range(w + 1)) + "]"
    return f"""
WITH lw AS (
  SELECT k, bts, v,
         LIST(v) OVER (PARTITION BY k ORDER BY bts
                       ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW) AS l
  FROM ts_obs
)
SELECT k, CAST(bts AS TIMESTAMP) AS bts, v,
       ROUND(
         LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(l) + 1),
                  i -> l[i] * ({pw})[LEN(l) - i + 1]))
         / (2.0 - 2.0 * ({pw})[LEN(l) + 1]), 6) AS ewma
FROM lw
ORDER BY k, bts
"""


def test_fuzz_ewma_random_windows(spark, duck):
    from rspl_spark.operators.timeseries import ewma

    failures = []
    for seed in (7, 99, 1024, 31337):
        rng = random.Random(seed)
        w = rng.randrange(1, 21)
        pdf = _random_sparse_obs(rng, 3600)
        duck.register("ts_obs", pdf)
        df = spark.createDataFrame(pdf, "k string, bts timestamp, v double")
        got = _canon(
            ewma(df, ["k"], "bts", "v", window=w)
            .select("k", "bts", "v", "ewma")
            .toPandas()
        )
        want = _canon(duck.sql(_ewma_fuzz_sql(w)).df())
        if not got.equals(want):
            failures.append((seed, w))
        duck.unregister("ts_obs")
    assert not failures, f"ewma fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #21: PageRank on random directed graphs — the checkpointed
# Spark power loop (operators/graph.py) must equal a DuckDB replay that
# UNROLLS the same synchronous iterations as plain CTEs, across random
# topologies (including dangling nodes and multi-edges collapsed via
# distinct), damping factors, and iteration counts.
# ---------------------------------------------------------------------------


def _pr_fuzz_sql(damping: float, n_iter: int) -> str:
    head = """
WITH nodes AS (SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM pr_edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    its = []
    for k in range(1, n_iter + 1):
        p = k - 1
        its.append(f""",
c{k} AS (SELECT e.dst AS node, SUM(r.rank / deg.d) AS contrib
         FROM pr_edges e JOIN r{p} r ON e.src = r.node
         JOIN deg ON deg.src = e.src GROUP BY e.dst),
d{k} AS (SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
         WHERE node NOT IN (SELECT src FROM deg)),
r{k} AS (SELECT n.node,
    (1 - {damping!r}) / (SELECT n FROM nn)
    + {damping!r} * (COALESCE(c.contrib, 0)
                     + (SELECT dmass FROM d{k}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    return head + "".join(its) + f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{n_iter} ORDER BY node
"""


def test_fuzz_pagerank_random_graphs(spark, duck):
    from rspl_spark.operators.graph import pagerank

    failures = []
    for seed in (11, 202, 4093):
        rng = random.Random(seed)
        n_nodes = rng.randrange(8, 40)
        nodes = [f"v{i}" for i in range(n_nodes)]
        pairs = {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randrange(n_nodes, n_nodes * 4))
        }
        pairs = sorted((s, d) for s, d in pairs if s != d)
        damping = rng.choice([0.5, 0.85, 0.9])
        n_iter = rng.randrange(1, 5)
        pdf = pd.DataFrame(pairs, columns=["src", "dst"])
        duck.register("pr_edges", pdf)
        e = spark.createDataFrame(pdf, "src string, dst string")
        got = _canon(
            pagerank(e, n_iter=n_iter, damping=damping)
            .select("node", F.round("rank", 6).alias("rank"))
            .toPandas()
        )
        want = _canon(duck.sql(_pr_fuzz_sql(damping, n_iter)).df())
        if not got.equals(want):
            failures.append((seed, damping, n_iter))
        duck.unregister("pr_edges")
    assert not failures, f"pagerank fuzz mismatches: {failures}"


def _ppr_fuzz_sql(damping: float, n_iter: int) -> str:
    head = """
WITH nodes AS (SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges),
deg AS (SELECT src, COUNT(*) AS d FROM pr_edges GROUP BY src),
sw AS (SELECT s.node, SUM(s.w) AS w FROM pr_seeds s
       JOIN nodes n ON s.node = n.node GROUP BY s.node),
wt AS (SELECT CAST(SUM(w) AS DOUBLE) AS t FROM sw),
rv AS (SELECT n.node, COALESCE(sw.w, 0) / (SELECT t FROM wt) AS reset
       FROM nodes n LEFT JOIN sw ON n.node = sw.node),
r0 AS (SELECT node, reset AS rank FROM rv)"""
    its = []
    for k in range(1, n_iter + 1):
        p = k - 1
        its.append(f""",
c{k} AS (SELECT e.dst AS node, SUM(r.rank / deg.d) AS contrib
         FROM pr_edges e JOIN r{p} r ON e.src = r.node
         JOIN deg ON deg.src = e.src GROUP BY e.dst),
d{k} AS (SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
         WHERE node NOT IN (SELECT src FROM deg)),
r{k} AS (SELECT v.node,
    (1 - {damping!r}) * v.reset
    + {damping!r} * (COALESCE(c.contrib, 0)
                     + (SELECT dmass FROM d{k}) * v.reset) AS rank
  FROM rv v LEFT JOIN c{k} c ON v.node = c.node)""")
    return head + "".join(its) + f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{n_iter} ORDER BY node
"""


def _wpr_fuzz_sql(damping: float, n_iter: int) -> str:
    head = """
WITH nodes AS (SELECT src AS node FROM pr_edges UNION SELECT dst FROM pr_edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, SUM(w) AS ow FROM pr_edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    its = []
    for k in range(1, n_iter + 1):
        p = k - 1
        its.append(f""",
c{k} AS (SELECT e.dst AS node, SUM(r.rank * e.w / deg.ow) AS contrib
         FROM pr_edges e JOIN r{p} r ON e.src = r.node
         JOIN deg ON deg.src = e.src GROUP BY e.dst),
d{k} AS (SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
         WHERE node NOT IN (SELECT src FROM deg)),
r{k} AS (SELECT n.node,
    (1 - {damping!r}) / (SELECT n FROM nn)
    + {damping!r} * (COALESCE(c.contrib, 0)
                     + (SELECT dmass FROM d{k}) / (SELECT n FROM nn)) AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)""")
    return head + "".join(its) + f"""
SELECT node, ROUND(rank, 6) AS rank FROM r{n_iter} ORDER BY node
"""


def test_fuzz_weighted_pagerank_random_graphs(spark, duck):
    """Grammar #21 extension (r11): edge-weighted PageRank with random
    half-integer weights (out-weight sums exact in binary) vs the
    DuckDB unrolled replay."""
    from rspl_spark.operators.graph import pagerank

    failures = []
    for seed in (23, 607, 7919):
        rng = random.Random(seed)
        n_nodes = rng.randrange(8, 32)
        nodes = [f"v{i}" for i in range(n_nodes)]
        pairs = sorted({
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randrange(n_nodes, n_nodes * 3))
        })
        pairs = [(s, d) for s, d in pairs if s != d]
        rows = [(s, d, rng.choice([0.5, 1.0, 1.5, 2.0])) for s, d in pairs]
        damping = rng.choice([0.5, 0.85])
        n_iter = rng.randrange(1, 4)
        pdf = pd.DataFrame(rows, columns=["src", "dst", "w"])
        duck.register("pr_edges", pdf)
        e = spark.createDataFrame(pdf, "src string, dst string, w double")
        got = _canon(
            pagerank(e, n_iter=n_iter, damping=damping, weight_col="w")
            .select("node", F.round("rank", 6).alias("rank"))
            .toPandas()
        )
        want = _canon(duck.sql(_wpr_fuzz_sql(damping, n_iter)).df())
        if not got.equals(want):
            failures.append((seed, damping, n_iter))
        duck.unregister("pr_edges")
    assert not failures, f"weighted pagerank fuzz mismatches: {failures}"


def test_fuzz_personalized_pagerank_random_graphs(spark, duck):
    """Grammar #21 extension (r11): personalized PageRank with random
    seed subsets and half-integer weights (exact in binary, so the
    normalization replays bit-for-bit) — the teleport vector replaces
    1/N in restart, dangling, AND init."""
    from rspl_spark.operators.graph import pagerank

    failures = []
    for seed in (17, 509, 8191):
        rng = random.Random(seed)
        n_nodes = rng.randrange(8, 32)
        nodes = [f"v{i}" for i in range(n_nodes)]
        pairs = {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(rng.randrange(n_nodes, n_nodes * 3))
        }
        pairs = sorted((s, d) for s, d in pairs if s != d)
        damping = rng.choice([0.5, 0.85])
        n_iter = rng.randrange(1, 4)
        n_seeds = rng.randrange(1, max(2, n_nodes // 3))
        seed_rows = [
            (rng.choice(nodes), rng.choice([0.5, 1.0, 1.5, 2.0]))
            for _ in range(n_seeds)
        ]
        pdf = pd.DataFrame(pairs, columns=["src", "dst"])
        spdf = pd.DataFrame(seed_rows, columns=["node", "w"])
        duck.register("pr_edges", pdf)
        duck.register("pr_seeds", spdf)
        e = spark.createDataFrame(pdf, "src string, dst string")
        s = spark.createDataFrame(spdf, "node string, w double")
        got = _canon(
            pagerank(e, n_iter=n_iter, damping=damping, reset_df=s)
            .select("node", F.round("rank", 6).alias("rank"))
            .toPandas()
        )
        want = _canon(duck.sql(_ppr_fuzz_sql(damping, n_iter)).df())
        if not got.equals(want):
            failures.append((seed, damping, n_iter))
        duck.unregister("pr_edges")
        duck.unregister("pr_seeds")
    assert not failures, f"personalized pagerank fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #22: Markov transition matrices on random event sequences with
# DELIBERATE timestamp ties — the lag-pair multiset is only well-defined
# under a total order, so the operator (tiebroken on a unique id) must
# match DuckDB's identically-tiebroken window for random keys, states,
# tie clusters, and single-event keys.
# ---------------------------------------------------------------------------

_TRANS_FUZZ_SQL = """
WITH pairs AS (
  SELECT LAG(st) OVER (PARTITION BY k ORDER BY t, eid) AS prev_state, st AS state
  FROM tm_events
)
SELECT prev_state, state, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER (PARTITION BY prev_state) AS DOUBLE),
             6) AS p
FROM pairs WHERE prev_state IS NOT NULL
GROUP BY prev_state, state
ORDER BY prev_state, state
"""


def test_fuzz_transition_matrix_with_ts_ties(spark, duck):
    from rspl_spark.operators.behavior import transition_matrix

    failures = []
    for seed in (13, 555, 7777):
        rng = random.Random(seed)
        states = ["s%d" % i for i in range(rng.randrange(2, 7))]
        rows, eid = [], 0
        for k in range(rng.randrange(3, 12)):
            t = 0
            for _ in range(rng.randrange(1, 30)):
                # ~30% of steps REUSE the previous timestamp (a tie)
                if rng.random() > 0.3:
                    t += rng.randrange(1, 5)
                rows.append((f"k{k}", t, rng.choice(states), eid))
                eid += 1
        pdf = pd.DataFrame(rows, columns=["k", "t", "st", "eid"])
        duck.register("tm_events", pdf)
        df = spark.createDataFrame(pdf, "k string, t long, st string, eid long")
        got = _canon(
            transition_matrix(df, "k", "t", "st", tiebreak_cols=["eid"]).toPandas()
        )
        want = _canon(duck.sql(_TRANS_FUZZ_SQL).df())
        if not got.equals(want):
            failures.append(seed)
        duck.unregister("tm_events")
    assert not failures, f"transition fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #23: k-hop BFS distances on random directed graphs — the
# frontier-expansion loop (operators/graph.py, checkpoint per round,
# early exit) must equal a DuckDB replay that unrolls the same frontier
# CTEs, across random topologies, source sets, and hop budgets.
# ---------------------------------------------------------------------------


def _khop_fuzz_sql(max_hops: int) -> str:
    head = """
WITH d0 AS (SELECT DISTINCT node, 0 AS dist FROM bfs_src),
f0 AS (SELECT node FROM d0)"""
    its = []
    for k in range(1, max_hops + 1):
        p = k - 1
        its.append(f""",
n{k} AS (SELECT DISTINCT e.dst AS node
         FROM bfs_edges e JOIN f{p} f ON e.src = f.node),
f{k} AS (SELECT node FROM n{k} WHERE node NOT IN (SELECT node FROM d{p})),
d{k} AS (SELECT * FROM d{p} UNION ALL SELECT node, {k} AS dist FROM f{k})""")
    return head + "".join(its) + f"""
SELECT node, CAST(dist AS BIGINT) AS dist FROM d{max_hops} ORDER BY node
"""


def test_fuzz_khop_random_graphs(spark, duck):
    from rspl_spark.operators.graph import khop_distances

    failures = []
    for seed in (17, 404, 9091):
        rng = random.Random(seed)
        n = rng.randrange(8, 36)
        nodes = [f"v{i}" for i in range(n)]
        pairs = sorted(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(rng.randrange(n, n * 3))
            }
        )
        pairs = [(s, d) for s, d in pairs if s != d]
        srcs = sorted(rng.sample(nodes, rng.randrange(1, 4)))
        hops = rng.randrange(0, 5)
        epdf = pd.DataFrame(pairs, columns=["src", "dst"])
        spdf = pd.DataFrame({"node": srcs})
        duck.register("bfs_edges", epdf)
        duck.register("bfs_src", spdf)
        got = _canon(
            khop_distances(
                spark.createDataFrame(epdf, "src string, dst string"),
                spark.createDataFrame(spdf, "node string"),
                max_hops=hops,
            ).toPandas()
        )
        want = _canon(duck.sql(_khop_fuzz_sql(hops)).df())
        if not got.equals(want):
            failures.append((seed, hops))
        duck.unregister("bfs_edges")
        duck.unregister("bfs_src")
    assert not failures, f"khop fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #24: cohort retention on random activity patterns — the
# window/agg formulation (operators/behavior.py) vs an independent
# DuckDB CTE for random user counts, activity densities, and both
# period grains.
# ---------------------------------------------------------------------------

_COHORT_FUZZ_SQL = """
WITH up AS (
  SELECT DISTINCT u, CAST(DATE_TRUNC('{period}', ts) AS DATE) AS p FROM cr_events
),
upc AS (SELECT u, p, MIN(p) OVER (PARTITION BY u) AS cohort FROM up),
counts AS (
  SELECT cohort, CAST(DATEDIFF('day', cohort, p) / {plen} AS BIGINT) AS "offset",
         CAST(COUNT(*) AS BIGINT) AS n_active
  FROM upc GROUP BY 1, 2
)
SELECT cohort, "offset", n_active,
       MAX(CASE WHEN "offset" = 0 THEN n_active END)
         OVER (PARTITION BY cohort) AS n_cohort,
       ROUND(CAST(n_active AS DOUBLE)
             / CAST(MAX(CASE WHEN "offset" = 0 THEN n_active END)
                    OVER (PARTITION BY cohort) AS DOUBLE), 6) AS retention
FROM counts
ORDER BY cohort, "offset"
"""


def test_fuzz_cohort_retention_random_activity(spark, duck):
    from rspl_spark.operators.behavior import cohort_retention

    failures = []
    for seed in (23, 808, 31415):
        rng = random.Random(seed)
        period, plen = rng.choice([("week", 7), ("day", 1)])
        t0 = pd.Timestamp("2024-01-01")  # a Monday
        rows = []
        for u in range(rng.randrange(5, 40)):
            start = rng.randrange(0, 30)
            for _ in range(rng.randrange(1, 15)):
                rows.append(
                    (u, t0 + pd.Timedelta(days=start + rng.randrange(0, 60),
                                          hours=rng.randrange(24)))
                )
        pdf = pd.DataFrame(rows, columns=["u", "ts"])
        duck.register("cr_events", pdf)
        df = spark.createDataFrame(pdf, "u long, ts timestamp")
        got = _canon(cohort_retention(df, "u", "ts", period).toPandas())
        want = _canon(
            duck.sql(_COHORT_FUZZ_SQL.format(period=period, plen=plen)).df()
        )
        if not got.equals(want):
            failures.append((seed, period))
        duck.unregister("cr_events")
    assert not failures, f"cohort fuzz mismatches: {failures}"


# ---------------------------------------------------------------------------
# Grammar #25: golden-record consolidation on random duplicate clusters
# with random NULL patterns and priority directions — survivorship +
# first-non-null backfill must match DuckDB's FIRST_VALUE IGNORE NULLS
# replay under a total (priority, unique id) order.
# ---------------------------------------------------------------------------


def test_fuzz_consolidate_records_random(spark, duck):
    from rspl_spark.operators.curation import consolidate_records

    failures = []
    for seed in (31, 313, 31337):
        rng = random.Random(seed)
        n_keys = rng.randrange(3, 10)
        rows = []
        rid = 0
        for k in range(n_keys):
            for _ in range(rng.randrange(1, 6)):
                rows.append((
                    f"k{k}",
                    rng.randrange(0, 50),           # ts (ties possible)
                    rid,                            # unique id tiebreak
                    rng.choice([None, "a", "b", "c"]),
                    rng.choice([None, 1.0, 2.5, 7.0]),
                ))
                rid += 1
        d1 = rng.choice(["asc", "desc"])
        comp = rng.choice([True, False])
        pdf = pd.DataFrame(rows, columns=["k", "ts", "rid", "seg", "val"])
        duck.register("gr_recs", pdf)
        df = spark.createDataFrame(
            pdf, "k string, ts long, rid long, seg string, val double"
        )
        got = _canon(
            consolidate_records(
                df, ["k"],
                priority=[("ts", d1), ("rid", "desc")],
                value_cols=["seg", "val"],
                completeness_first=comp,
            ).toPandas()
        )
        comp_expr = (
            "(CASE WHEN seg IS NOT NULL THEN 1 ELSE 0 END"
            " + CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END) DESC, "
            if comp
            else ""
        )
        order = f"{comp_expr}ts {d1.upper()}, rid DESC"
        frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
        want = _canon(duck.sql(f"""
            SELECT k, seg, val FROM (
              SELECT k,
                ROW_NUMBER() OVER (PARTITION BY k ORDER BY {order}) AS rn,
                FIRST_VALUE(seg IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY {order} {frame}) AS seg,
                FIRST_VALUE(val IGNORE NULLS) OVER (
                  PARTITION BY k ORDER BY {order} {frame}) AS val
              FROM gr_recs
            ) WHERE rn = 1 ORDER BY k
        """).df())
        if not got.equals(want):
            failures.append((seed, d1, comp))
        duck.unregister("gr_recs")
    assert not failures, f"consolidate fuzz mismatches: {failures}"
