"""Interval analytics: peak concurrency over [start, end) intervals.

"How many sessions/connections/jobs were active at once?" is the
classic interval-sweep question. The textbook form sorts ±1 deltas and
takes the max running sum — a single global order. The scale form used
here collapses deltas per DISTINCT boundary timestamp first (one
groupBy — V distinct boundaries, not 2n rows, cross the wire) and runs
the cumulative window over those V rows, the same V-not-n discipline as
the KS statistic. Correctness of the collapse: with half-open
intervals, ends at t retire before starts at t admit, and the running
NET after processing all of t's deltas is where the maximum is attained
(applying the negative deltas first can only dip lower), so
max-over-prefix of the per-t net equals the event-by-event peak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def peak_concurrency(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """One row (peak, n_intervals): the maximum number of [start, end)
    intervals simultaneously open. NULL or empty (end <= start)
    intervals are ignored and do not count in n_intervals."""
    ok = intervals.filter(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) > F.col(start_col))
    )
    deltas = ok.select(
        F.col(start_col).alias("_t"), F.lit(1).alias("_d")
    ).unionAll(ok.select(F.col(end_col).alias("_t"), F.lit(-1).alias("_d")))
    per_t = deltas.groupBy("_t").agg(F.sum("_d").alias("net"))
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    running = per_t.select(F.sum("net").over(w).alias("open_after_t"))
    peak = running.agg(F.max("open_after_t").cast("long").alias("peak"))
    n = ok.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    return peak.crossJoin(F.broadcast(n))
