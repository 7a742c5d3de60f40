"""Distribution-drift detection: two-sample Kolmogorov-Smirnov statistic.

A pipeline ingesting daily increments needs to notice when a source's
distribution moves — shorter documents, shifted quality scores, a new
crawler dumping boilerplate. The two-sample KS statistic
D = max_x |F_a(x) - F_b(x)| is the standard nonparametric answer, and
it is exactly computable with two shuffles: one groupBy on the value
(collapsing n rows to V distinct values, each carrying both groups'
counts), then cumulative sums over the value order. V — not n — bounds
the window work, and for continuous values the optional ``bins``
quantization caps V at a constant (histogram-KS, the standard practice
for drift monitors at scale). Integer counts everywhere until the final
two divisions, so an independent engine reproduces D exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
    bins: int | None = None,
) -> DataFrame:
    """One-row DataFrame (d_stat, n_a, n_b) — the two-sample KS distance
    between ``value_col``'s distribution where ``in_a`` holds and where
    ``in_b`` holds. Rows in neither group are ignored; a row matching
    both predicates counts in both samples.

    ``bins`` quantizes values to that many equal-width buckets first
    (min/max from one scalar agg) — set it when the value is continuous
    or high-cardinality so the cumulative window runs over a bounded
    number of rows.
    """
    v = F.col(value_col).cast("double")
    if bins is not None:
        stats = df.filter(in_a | in_b).agg(
            F.min(v).alias("mn"), F.max(v).alias("mx")
        ).first()
        if stats["mn"] is None:
            raise ValueError("ks_statistic: no rows match either group")
        mn, mx = float(stats["mn"]), float(stats["mx"])
        span = (mx - mn) or 1.0
        v = F.least(
            F.floor((v - F.lit(mn)) * bins / F.lit(span)), F.lit(bins - 1)
        ).cast("double")
    both = df.filter(in_a | in_b).select(
        v.alias("_v"),
        in_a.cast("long").alias("_a"),
        in_b.cast("long").alias("_b"),
    )
    per_value = both.groupBy("_v").agg(
        F.sum("_a").alias("ca"), F.sum("_b").alias("cb")
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_value.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    totals = both.agg(
        F.sum("_a").cast("long").alias("n_a"), F.sum("_b").cast("long").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
            ).alias("diff"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").alias("d_stat"))
        .select("d_stat", "n_a", "n_b")
    )
