"""Binned (bucketized) range join — the scale path for point-in-interval
joins with NO equi key.

A pure range predicate gives Catalyst nothing to hash on, so the plan
degenerates to a BroadcastNestedLoopJoin / cartesian — O(|points| ×
|intervals|) comparisons, which is exactly the shape this repo guards
against elsewhere (``exact_scored_pairs(allow_quadratic=...)``). The
standard distributed fix quantizes the range domain into fixed-width
bins: each point lands in exactly ONE bin, each interval explodes into
the bins it covers, the join becomes an equi-join on the bin id, and the
exact range predicate is re-applied as a cheap post-filter. Every
shuffle is keyed on the (uniform) bin id; work is
O(points + intervals × bins_per_interval + true_matches).

Bin sizing: pick ``bin_seconds`` near the typical interval length — one
to two bins per interval. Too small explodes the interval side; too
large packs unrelated rows into a bin (more post-filtered candidates).
Same trade every time-binning engine documents (e.g. interval join
implementations in stream processors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_pairs(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bin_seconds: int = 3600,
    max_bins_per_interval: int = 1 << 20,
) -> DataFrame:
    """Inner-join pairs: every (interval row, point row) with
    ``start_ts <= point_ts <= end_ts`` (inclusive bounds), produced via
    bin equi-join — no nested-loop join anywhere in the plan.

    Output: all interval columns + all point columns (caller ensures
    disjoint names). Pairs are exact and unique: a point has one bin, so
    a pair can only meet in that single bin — no dedup pass needed.
    Intervals with ``start > end`` are dropped (``F.sequence`` would
    otherwise generate a DESCENDING bin range and silently "match" the
    reversed interval). One DIRTY interval (end in year 9999) would
    explode tens of millions of bin rows from a single input row —
    ``max_bins_per_interval`` fails the query loudly instead (same
    blowup discipline as ngram_jaccard_pairs' allow_quadratic); raise
    ``bin_seconds`` or clean the interval if the span is genuine.
    """
    if bin_seconds <= 0:
        raise ValueError("bin_seconds must be positive")
    for c in ("_pbin", "_ibin"):
        if c in points.columns or c in intervals.columns:
            raise ValueError(f"column {c!r} already exists on an input")
    pe = F.col(point_ts).cast("double")
    se, ee = F.col(start_ts).cast("double"), F.col(end_ts).cast("double")
    p = points.withColumn("_pbin", F.floor(pe / bin_seconds))
    lo_bin, hi_bin = F.floor(se / bin_seconds), F.floor(ee / bin_seconds)
    n_bins = hi_bin - lo_bin + 1
    guarded_hi = F.when(n_bins <= max_bins_per_interval, hi_bin).otherwise(
        F.raise_error(
            F.concat(
                F.lit("point_in_interval_pairs: an interval spans "),
                n_bins.cast("string"),
                F.lit(
                    f" bins > max_bins_per_interval={max_bins_per_interval};"
                    " raise bin_seconds or clean the interval"
                ),
            )
        ).cast("long")
    )
    i = intervals.filter(se <= ee).withColumn(
        "_ibin",
        F.explode(F.sequence(lo_bin, guarded_hi)),
    )
    return (
        i.join(p, F.col("_ibin") == F.col("_pbin"))
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_pbin", "_ibin")
    )
