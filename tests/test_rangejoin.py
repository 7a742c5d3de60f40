"""Binned range join (operators/rangejoin.py): exactness vs a literal
quadratic join, boundary inclusivity, reversed-interval guard, and the
plan property the operator exists for — no nested-loop join."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.rangejoin import point_in_interval_pairs


def _frames(spark):
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": range(6),
                "ts": [t0 + pd.Timedelta(minutes=m) for m in (0, 30, 60, 90, 119, 240)],
            }
        ),
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": [0, 1, 2],
                "ts_start": [t0, t0 + pd.Timedelta(hours=1), t0 + pd.Timedelta(hours=10)],
                "ts_end": [
                    t0 + pd.Timedelta(hours=1),
                    t0 + pd.Timedelta(hours=2),
                    t0 + pd.Timedelta(hours=11),
                ],
            }
        ),
        "iid long, ts_start timestamp, ts_end timestamp",
    )
    return pts, iv


def test_matches_quadratic_join_and_inclusive_bounds(spark):
    pts, iv = _frames(spark)
    got = {
        (r["iid"], r["pid"])
        for r in point_in_interval_pairs(pts, iv, start_ts="ts_start", end_ts="ts_end", bin_seconds=3600).collect()
    }
    want = {
        (r["iid"], r["pid"])
        for r in iv.join(
            pts, (pts.ts >= iv.ts_start) & (pts.ts <= iv.ts_end)
        ).collect()
    }
    assert got == want
    # both ends inclusive: the point at exactly 01:00 joins interval 0
    # (its end) AND interval 1 (its start)
    assert (0, 2) in got and (1, 2) in got


@pytest.mark.parametrize("bin_seconds", [60, 3600, 86400])
def test_bin_width_does_not_change_result(spark, bin_seconds):
    pts, iv = _frames(spark)
    got = {
        (r["iid"], r["pid"])
        for r in point_in_interval_pairs(pts, iv, start_ts="ts_start", end_ts="ts_end", bin_seconds=bin_seconds).collect()
    }
    assert got == {(0, 0), (0, 1), (0, 2), (1, 2), (1, 3), (1, 4)}


def test_reversed_interval_dropped_not_reversed(spark):
    """start > end must yield NOTHING — F.sequence would happily count
    bins DOWNWARD and fabricate matches for the flipped interval."""
    pts, _ = _frames(spark)
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"iid": [9], "ts_start": [t0 + pd.Timedelta(hours=2)], "ts_end": [t0]}
        ),
        "iid long, ts_start timestamp, ts_end timestamp",
    )
    assert point_in_interval_pairs(pts, bad, start_ts="ts_start", end_ts="ts_end").count() == 0


def test_bin_column_collision_raises(spark):
    pts, iv = _frames(spark)
    with pytest.raises(ValueError, match="_pbin"):
        point_in_interval_pairs(pts.withColumn("_pbin", F.lit(1)), iv, start_ts="ts_start", end_ts="ts_end")


def test_plan_has_no_nested_loop(spark):
    """The reason the operator exists: the pure-range join plans as a
    bin equi-join (hash/merge), never BroadcastNestedLoop/Cartesian."""
    from rspl_spark.queries.joins import q_binned_range_join

    df = q_binned_range_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dirty_wide_interval_fails_loudly(spark):
    """Review fix: a single corrupt interval spanning tens of millions
    of bins must raise, not OOM the executor with one exploded row."""
    import datetime as dt

    pts = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), dt.datetime(9999, 1, 1))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        point_in_interval_pairs(pts, iv, bin_seconds=3600).collect()
    # a raised explicit cap admits a wide-but-genuine interval (~1.17M
    # hourly bins, just over the 1<<20 default). Deliberately NOT the
    # year-9999 interval: admitting that one materializes a ~70M-long
    # F.sequence in a single task — the exact blowup the guard exists
    # to prevent, and it OOMs the shared test JVM under full-suite
    # memory pressure (r15 soak).
    wide = spark.createDataFrame(
        [(1, dt.datetime(2020, 1, 1), dt.datetime(2153, 1, 1))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        point_in_interval_pairs(pts, wide, bin_seconds=3600).collect()
    n = point_in_interval_pairs(
        pts, wide, bin_seconds=3600, max_bins_per_interval=1 << 21
    ).count()
    assert n == 1
