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
