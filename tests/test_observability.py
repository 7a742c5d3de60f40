"""Pipeline observability: quality metrics accumulated IN the same pass
as the work (pyspark Observation / df.observe) — at 100 TB an extra
metrics scan over the corpus is a second full read, so counters must
ride the production action."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators.text import lang_pred_expr, quality_expr

SF = "/root/testdata/sf0.001"


def test_curation_metrics_ride_the_cleaning_pass(spark):
    docs = load(spark, SF, "documents")
    obs_in = Observation("intake")
    obs_out = Observation("survivors")
    signals = docs.observe(
        obs_in,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(F.col("text").isNull() | (F.trim("text") == ""), 1).otherwise(0)).alias(
            "empty_docs"
        ),
    ).select(
        "doc_id",
        quality_expr().alias("quality"),
        lang_pred_expr().alias("pred_lang"),
    )
    kept = signals.filter(
        (F.col("quality") >= 0.5) & (F.col("pred_lang") == "en")
    ).observe(
        obs_out,
        F.count(F.lit(1)).alias("rows"),
        F.avg("quality").alias("mean_quality"),
    )
    n_kept = kept.count()  # ONE action drives pipeline + both observers

    assert obs_in.get["rows"] == docs.count()
    assert obs_out.get["rows"] == n_kept
    assert 0.5 <= obs_out.get["mean_quality"] <= 1.0
    # the survival rate the pipeline would alert on
    rate = obs_out.get["rows"] / obs_in.get["rows"]
    assert 0.0 < rate <= 1.0


def test_observation_matches_dedicated_aggregation(spark):
    """The observed numbers are exact (not sampled): equal to a
    dedicated aggregation pass over the same frame."""
    docs = load(spark, SF, "documents")
    obs = Observation("check")
    out = docs.observe(
        obs,
        F.sum(F.length("text")).alias("chars"),
        F.approx_count_distinct("source").alias("approx_sources"),
    )
    out.count()
    want = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert obs.get["chars"] == want
    assert obs.get["approx_sources"] >= 1
