"""Mergeable-sketch operators (Apache DataSketches HLL, built into Spark
3.5+): the scale-native distinct-count path. Per SURVEY's determinism
rule, approximate results are tolerance-tested, not hash-gated — what IS
exact (and what matters at 1000 executors) is mergeability: partial
sketches combined with hll_union_agg must equal the one-shot sketch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_within_tolerance(spark):
    n = 100_000
    df = spark.range(n).select((F.col("id") % 20_000).alias("v"))
    est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 20_000) / 20_000 < 0.05


def test_hll_sketches_merge_exactly(spark):
    """Partial per-group sketches unioned == one-shot sketch: the
    map-side-combine property that lets 1000 executors each sketch their
    partitions and ship bytes, not rows."""
    df = spark.range(50_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 9_000).alias("v")
    )
    one_shot = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == one_shot


def test_hll_union_across_frames(spark):
    """Sketches survive materialization (binary column) and union across
    independently-built frames — incremental corpus stats without
    recomputing history."""
    a = spark.range(0, 30_000).select((F.col("id") % 5_000).alias("v"))
    b = spark.range(15_000, 60_000).select((F.col("id") % 5_000).alias("v"))
    ska = a.agg(F.hll_sketch_agg("v").alias("sk"))
    skb = b.agg(F.hll_sketch_agg("v").alias("sk"))
    est = (
        ska.unionByName(skb)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    # both frames cover the same 5000 distinct values
    assert abs(est - 5_000) / 5_000 < 0.05
