"""UDF surface (SURVEY.md §2.2 "UDF surface"): scalar UDF, vectorized
pandas UDF, grouped-map (applyInPandas), grouped-agg UDAF, mapInPandas
table function, and Python UDTF."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [(i, "g" + str(i % 3), float(i)) for i in range(30)], "id long, g string, v double"
    )


def test_scalar_python_udf(spark, df):
    f = udf(lambda x: x * 2 + 1, "double")
    got = df.select(f("v").alias("o")).agg(F.sum("o")).collect()[0][0]
    assert got == sum(v * 2 + 1 for v in range(30))


def test_vectorized_pandas_udf(spark, df):
    @pandas_udf("double")
    def vec(s: pd.Series) -> pd.Series:
        return s * 2 + 1

    got = df.select(vec("v").alias("o")).agg(F.sum("o")).collect()[0][0]
    assert got == sum(v * 2 + 1 for v in range(30))


def test_grouped_map_applyInPandas(spark, df):
    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["v"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = df.groupBy("g").applyInPandas(center, schema="id long, g string, v double")
    sums = {r["g"]: round(r["s"], 9) for r in out.groupBy("g").agg(F.sum("v").alias("s")).collect()}
    assert sums == {"g0": 0.0, "g1": 0.0, "g2": 0.0}


def test_grouped_agg_pandas_udaf(spark, df):
    @pandas_udf("double")
    def trimmed_mean(s: pd.Series) -> float:
        s = s.sort_values()
        return float(s.iloc[1:-1].mean()) if len(s) > 2 else float(s.mean())

    got = {
        r["g"]: r["tm"]
        for r in df.groupBy("g").agg(trimmed_mean("v").alias("tm")).collect()
    }
    for g in ("g0", "g1", "g2"):
        vals = sorted(v for i, v in ((i, float(i)) for i in range(30)) if "g" + str(i % 3) == g)
        assert got[g] == pytest.approx(sum(vals[1:-1]) / len(vals[1:-1]))


def test_windowed_pandas_udaf(spark, df):
    from pyspark.sql.window import Window

    @pandas_udf("double")
    def pmean(s: pd.Series) -> float:
        return float(s.mean())

    w = Window.partitionBy("g").orderBy("id").rowsBetween(-2, 0)
    out = df.withColumn("m", pmean("v").over(w))
    row = out.filter(F.col("id") == 9).collect()[0]  # g0: ids 0,3,6,9 → mean(3,6,9)
    assert row["m"] == pytest.approx(6.0)


def test_mapInPandas_table_function(spark, df):
    def expand(batches):
        for pdf in batches:
            out = pdf.loc[pdf.index.repeat(2)].reset_index(drop=True)
            out["copy"] = [i % 2 for i in range(len(out))]
            yield out[["id", "copy"]]

    out = df.mapInPandas(expand, schema="id long, copy long")
    assert out.count() == 60
    assert out.filter(F.col("copy") == 1).count() == 30


def test_python_udtf(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="x long, sq long")
    class Squares:
        def eval(self, n: int):
            for i in range(n):
                yield i, i * i

    got = [tuple(r) for r in Squares(F.lit(4)).collect()]
    assert got == [(0, 0), (1, 1), (2, 4), (3, 9)]
