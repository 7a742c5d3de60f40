"""Interval analytics: peak concurrency over [start, end) intervals.

"How many sessions/connections/jobs were active at once?" is the
classic interval-sweep question. The textbook serial form sorts ±1
deltas and takes the max running sum; the distributed form used here
is the parallel max-prefix-sum reduction:

1. collapse deltas per DISTINCT boundary timestamp (one groupBy — V
   distinct boundaries, not 2n rows, cross the wire; the KS V-not-n
   discipline),
2. range-partition those V rows by time; inside each partition one
   sorted streaming pass yields (total, max_prefix) — no global
   window, no single-task sort of all V rows,
3. combine the P pairs driver-side: peak = max_p(offset_p +
   max_prefix_p), offset_p = Σ earlier partitions' totals. P numbers
   cross to the driver, nothing else.

(The single-partition cumulative-window form measured 19.6s at sf10 —
2M boundaries through one task; this form spreads that scan across
the cluster.) Correctness of the per-t collapse: with half-open
intervals, ends at t retire before starts at t admit, and the running
NET after processing all of t's deltas is where the maximum is
attained (negative deltas first only dip lower), so max-over-prefix
of per-t nets equals the event-by-event peak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _reduce_partition(pdf):
    """One (pid, min_t_sort, total, max_prefix) row for a range
    partition's boundary rows, scanned in time order. min_t_sort
    orders partitions on the driver — range partitioning guarantees
    disjoint time spans, so any orderable surrogate works
    (nanoseconds for timestamps, the value itself for numerics)."""
    import pandas as pd

    pdf = pdf.sort_values("_t", kind="mergesort")
    total = 0
    best = None
    for v in pdf["net"]:
        total += int(v)
        best = total if best is None else max(best, total)
    t0 = pdf["_t"].iloc[0]
    key = int(pd.Timestamp(t0).value) if isinstance(t0, pd.Timestamp) else int(t0)
    return pd.DataFrame(
        {
            "pid": [int(pdf["pid"].iloc[0])],
            "min_t_sort": [key],
            "total": [total],
            "max_prefix": [best],
        }
    )


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

    # range partitioning keeps each partition a contiguous, disjoint
    # time span — the precondition for the driver-side combine
    tagged = per_t.repartitionByRange("_t").withColumn(
        "pid", F.spark_partition_id()
    )
    per_part = tagged.groupBy("pid").applyInPandas(
        _reduce_partition, "pid long, min_t_sort long, total long, max_prefix long"
    )
    parts = sorted(per_part.collect(), key=lambda r: (r["min_t_sort"], r["pid"]))
    peak_val = 0
    offset = 0
    for r in parts:
        peak_val = max(peak_val, offset + r["max_prefix"])
        offset += r["total"]
    n_row = ok.agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    spark = intervals.sparkSession
    return (
        spark.createDataFrame([(int(peak_val),)], "peak long")
        .crossJoin(F.broadcast(n_row))
    )
