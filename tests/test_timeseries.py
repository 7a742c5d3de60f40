"""Time-series operator tests (operators/timeseries.py): gapfill
LOCF/linear/zero/null semantics and edge cases the oracle gates don't
reach (single-observation keys, constant series, NULL observations,
the max_gap_buckets guard), exact EWMA arithmetic, rolling median, MAD
fences — plus plan pins (every gate reads its parquet ONCE; mad is two
window percentiles over one exchange, not agg+join branches).

Reference analog: the paced stream combinators (src/combinators.rs)
assume a dense tick grid; these operators rebuild it.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rspl_spark.operators.timeseries import (
    ewma,
    gapfill,
    mad_outliers,
    rolling_median,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(h: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=h)


def _obs(spark, rows):
    """rows: (key, hours_from_T0, value)"""
    return spark.createDataFrame(
        [Row(k=k, bts=_ts(h), v=float(v) if v is not None else None) for k, h, v in rows]
    )


# ---------------------------------------------------------------- gapfill


def test_gapfill_locf_fills_interior_gaps(spark):
    df = _obs(spark, [("a", 0, 10.0), ("a", 18, 40.0)])  # 6h grid, 2 gaps
    out = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "locf"}).orderBy("bts")
    rows = [(r["bts"], r["v"], r["is_gap"]) for r in out.collect()]
    assert rows == [
        (_ts(0), 10.0, False),
        (_ts(6), 10.0, True),
        (_ts(12), 10.0, True),
        (_ts(18), 40.0, False),
    ]


def test_gapfill_linear_is_exact_lerp(spark):
    df = _obs(spark, [("a", 0, 10.0), ("a", 18, 40.0)])
    out = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "linear"}).orderBy("bts")
    vals = [r["v"] for r in out.collect()]
    assert vals == [10.0, 20.0, 30.0, 40.0]


def test_gapfill_zero_and_null_fill_methods(spark):
    df = _obs(spark, [("a", 0, 5.0), ("a", 12, 7.0)])
    out = (
        gapfill(df, ["k"], "bts", "6 HOURS", {"v": "zero"})
        .orderBy("bts")
        .collect()
    )
    assert [r["v"] for r in out] == [5.0, 0.0, 7.0]
    out = (
        gapfill(df, ["k"], "bts", "6 HOURS", {"v": "null"})
        .orderBy("bts")
        .collect()
    )
    assert [r["v"] for r in out] == [5.0, None, 7.0]


def test_gapfill_single_observation_key(spark):
    """One observation → grid is exactly that bucket; no gap invented
    before or after (the grid spans [first, last] per key)."""
    df = _obs(spark, [("solo", 6, 3.0), ("b", 0, 1.0), ("b", 6, 2.0)])
    out = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "locf"})
    solo = out.where(F.col("k") == "solo").collect()
    assert len(solo) == 1
    assert (solo[0]["bts"], solo[0]["v"], solo[0]["is_gap"]) == (_ts(6), 3.0, False)
    assert out.where(F.col("k") == "b").count() == 2  # dense, no extras


def test_gapfill_never_extrapolates_head_or_tail(spark):
    """Grid per key = [min(bts), max(bts)] — no buckets before the
    first or after the last observation, even when other keys span
    wider."""
    df = _obs(spark, [("a", 0, 1.0), ("a", 24, 2.0), ("z", 12, 9.0)])
    out = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "locf"})
    z = out.where(F.col("k") == "z").collect()
    assert [r["bts"] for r in z] == [_ts(12)]
    a = sorted(r["bts"] for r in out.where(F.col("k") == "a").collect())
    assert a[0] == _ts(0) and a[-1] == _ts(24) and len(a) == 5


def test_gapfill_null_observation_carries_as_is(spark):
    """Documented contract: a NULL observed value is an observation —
    LOCF carries the NULL across its segment (carry-as-is, NOT
    IGNORE-NULLS LOCF; pre-filter for the latter)."""
    df = _obs(spark, [("a", 0, 1.0), ("a", 6, None), ("a", 18, 4.0)])
    out = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "locf"}).orderBy("bts")
    rows = [(r["v"], r["is_gap"]) for r in out.collect()]
    assert rows == [(1.0, False), (None, False), (None, True), (4.0, False)]
    # and the IGNORE-NULLS form is one pre-filter away
    out2 = gapfill(
        df.where(F.col("v").isNotNull()), ["k"], "bts", "6 HOURS", {"v": "locf"}
    ).orderBy("bts")
    assert [r["v"] for r in out2.collect()] == [1.0, 1.0, 1.0, 4.0]


def test_gapfill_max_gap_buckets_guard_raises(spark):
    df = _obs(spark, [("a", 0, 1.0), ("a", 60, 2.0)])  # 10-bucket gap
    guarded = gapfill(
        df, ["k"], "bts", "6 HOURS", {"v": "locf"}, max_gap_buckets=5
    )
    with pytest.raises(Exception, match="max_gap_buckets"):
        guarded.collect()
    ok = gapfill(df, ["k"], "bts", "6 HOURS", {"v": "locf"}, max_gap_buckets=10)
    assert ok.count() == 11
    unguarded = gapfill(
        df, ["k"], "bts", "6 HOURS", {"v": "locf"}, max_gap_buckets=None
    )
    assert unguarded.count() == 11


def test_gapfill_guard_floors_fractional_gaps_like_stream(spark):
    """r11 advice fix: the batch guard floors the bucket count — the
    same comparison gapfill_stream uses ((t - last_ns) // step_ns) —
    so an off-grid gap of 5.5 buckets passes a max_gap_buckets=5 guard
    in BOTH twins instead of raising only in batch."""
    df = _obs(spark, [("a", 0, 1.0), ("a", 33, 2.0)])  # 5.5 buckets at 6h
    out = gapfill(
        df, ["k"], "bts", "6 HOURS", {"v": "locf"}, max_gap_buckets=5
    )
    assert out.count() == 6  # floor(5.5)=5 ≤ 5 — no raise, same as stream
    with pytest.raises(Exception, match="max_gap_buckets"):
        gapfill(
            df, ["k"], "bts", "6 HOURS", {"v": "locf"}, max_gap_buckets=4
        ).collect()


def test_gapfill_validates_methods(spark):
    df = _obs(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError, match="no fill columns"):
        gapfill(df, ["k"], "bts", "6 HOURS", {})
    with pytest.raises(ValueError, match="unknown method"):
        gapfill(df, ["k"], "bts", "6 HOURS", {"v": "spline"})


# ------------------------------------------------------------------ ewma


def test_ewma_matches_hand_computed_weights(spark):
    """w buckets, decay 1/2: ewma_t = Σ x_{t-j}·2^-j / Σ 2^-j."""
    df = _obs(spark, [("a", 0, 1.0), ("a", 6, 2.0), ("a", 12, 4.0)])
    out = ewma(df, ["k"], "bts", "v", window=16).orderBy("bts").collect()

    def ref(xs):
        n = len(xs)
        num = sum(x * 2.0 ** -(n - 1 - i) for i, x in enumerate(xs))
        return round(num / (2.0 - 2.0 ** -(n - 1)), 6)

    assert [r["ewma"] for r in out] == [
        ref([1.0]),
        ref([1.0, 2.0]),
        ref([1.0, 2.0, 4.0]),
    ]


def test_ewma_window_one_is_identity(spark):
    df = _obs(spark, [("a", 0, 3.5), ("a", 6, 7.25)])
    out = ewma(df, ["k"], "bts", "v", window=1).orderBy("bts").collect()
    assert [r["ewma"] for r in out] == [3.5, 7.25]


def test_ewma_truncates_to_window(spark):
    """Buckets beyond the trailing window contribute nothing."""
    rows = [("a", 6 * i, float(i)) for i in range(6)]
    out = ewma(_obs(spark, rows), ["k"], "bts", "v", window=2).orderBy("bts").collect()
    # window=2: ewma = (prev·1 + cur·2) / 3
    exp = [0.0] + [round((i - 1 + 2.0 * i) / 3.0, 6) for i in range(1, 6)]
    assert [r["ewma"] for r in out] == exp


def test_ewma_null_values_shrink_window(spark):
    """Documented contract: collect_list drops NULLs — a NULL bucket
    shrinks the window rather than contributing zero."""
    df = _obs(spark, [("a", 0, 2.0), ("a", 6, None), ("a", 12, 4.0)])
    out = ewma(df, ["k"], "bts", "v", window=16).orderBy("bts").collect()
    assert out[1]["ewma"] == 2.0  # NULL row sees only [2.0]
    assert out[2]["ewma"] == round((2.0 * 0.5 + 4.0) / 1.5, 6)  # [2.0, 4.0]


def test_ewma_validates_window(spark):
    df = _obs(spark, [("a", 0, 1.0)])
    for bad in (0, 53):
        with pytest.raises(ValueError, match="window"):
            ewma(df, ["k"], "bts", "v", window=bad)


# -------------------------------------------------------- rolling median


def test_rolling_median_exact_interpolating(spark):
    df = _obs(spark, [("a", 6 * i, v) for i, v in enumerate([1.0, 9.0, 2.0, 8.0])])
    out = rolling_median(df, ["k"], "bts", "v", n_buckets=3).orderBy("bts").collect()
    assert [r["rmedian"] for r in out] == [1.0, 5.0, 2.0, 8.0]


def test_rolling_median_backticks_odd_column_names(spark):
    """Identifier with a space must be quoted, not pasted raw into SQL
    (ADVICE r9: breakage + injection vector)."""
    df = _obs(spark, [("a", 0, 1.0), ("a", 6, 3.0)]).withColumnRenamed("v", "my value")
    out = (
        rolling_median(df, ["k"], "bts", "my value", n_buckets=7)
        .orderBy("bts")
        .collect()
    )
    assert [r["rmedian"] for r in out] == [1.0, 2.0]


# ---------------------------------------------------------- mad_outliers


def test_mad_outliers_flags_the_wild_value_z_would_hide(spark):
    vals = [10.0, 11.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    df = _obs(spark, [("a", 6 * i, v) for i, v in enumerate(vals)])
    out = mad_outliers(df, ["k"], "v", k=3.0)
    flagged = [r["v"] for r in out.where("is_outlier").collect()]
    assert flagged == [1000.0]
    med = out.select("med").first()["med"]
    assert med == 10.2  # exact median, unmoved by the outlier


def test_mad_outliers_constant_series_mad_zero(spark):
    """MAD == 0 (over half identical): strict > fence flags ANY
    deviation and nothing else."""
    df = _obs(spark, [("a", 6 * i, 5.0) for i in range(5)] + [("a", 30, 5.1)])
    out = mad_outliers(df, ["k"], "v", k=3.0)
    assert out.select("mad").first()["mad"] == 0.0
    assert [r["v"] for r in out.where("is_outlier").collect()] == [5.1]
    # fully constant: no deviation at all → zero outliers
    const = _obs(spark, [("c", 6 * i, 7.0) for i in range(4)])
    assert mad_outliers(const, ["k"], "v").where("is_outlier").count() == 0


def test_mad_outliers_backticks_odd_column_names(spark):
    df = _obs(spark, [("a", 0, 1.0), ("a", 6, 2.0)]).withColumnRenamed("v", "a b")
    out = mad_outliers(df, ["k"], "a b", k=3.0)
    assert out.where("is_outlier").count() == 0


def test_mad_outliers_matches_agg_join_reference(spark):
    """The window form must compute the SAME med/mad as the textbook
    two-aggregate formulation it replaced (plan changed, values must
    not)."""
    import random

    rng = random.Random(7)
    rows = [
        (k, 6 * i, round(rng.uniform(0, 100), 3))
        for k in ("a", "b", "c")
        for i in range(40)
    ]
    df = _obs(spark, rows)
    got = {
        (r["k"], r["bts"]): (r["med"], r["mad"], r["is_outlier"])
        for r in mad_outliers(df, ["k"], "v", k=2.5).collect()
    }
    med = df.groupBy("k").agg(F.expr("percentile(v, 0.5)").alias("m"))
    ref_med = {r["k"]: r["m"] for r in med.collect()}
    ref_mad = {
        r["k"]: r["d"]
        for r in df.join(med, "k")
        .withColumn("ad", F.abs(F.col("v") - F.col("m")))
        .groupBy("k")
        .agg(F.expr("percentile(ad, 0.5)").alias("d"))
        .collect()
    }
    for (k, bts), (m, d, flag) in got.items():
        assert math.isclose(m, ref_med[k], rel_tol=0, abs_tol=1e-12)
        assert math.isclose(d, ref_mad[k], rel_tol=0, abs_tol=1e-12)


# -------------------------------------------------------------- plan pins


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints BOTH the final and the
    # initial plan; count operators in the final section only
    return plan.split("== Initial Plan ==")[0]


@pytest.fixture(scope="module")
def ts_reg():
    from rspl_spark.queries import load_registry

    return load_registry()


SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "gate", ["q_gapfill_locf", "q_gapfill_interp", "q_ewma", "q_rolling_median"]
)
def test_timeseries_gates_scan_events_once(spark, ts_reg, gate):
    plan = _executed_plan(ts_reg[gate].fn(spark, SF))
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1


def test_mad_gate_is_one_scan_one_wide_exchange(spark, ts_reg):
    """r9 verdict's `weak` item: the agg+broadcast-join draft re-executed
    the shared input subplan per branch — 4 parquet scans, 11 exchanges.
    The window form pins 1 scan and ≤3 exchanges (bucket agg, window
    partition, presentation sort)."""
    plan = _executed_plan(ts_reg["q_mad_outliers"].fn(spark, SF))
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1
    assert plan.count("Exchange") <= 3


# ------------------------------------------------------------ resample


def test_resample_composes_bucket_agg_and_gapfill(spark):
    """bucket→agg→gapfill in one call: unfilled agg columns appear NULL
    on gap rows; filled ones follow their method."""
    from rspl_spark.operators.timeseries import resample

    raw = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(0.5), x=2.0),
            Row(k="a", ts=_ts(1.0), x=4.0),
            Row(k="a", ts=_ts(13.0), x=10.0),  # skips the 06:00 bucket
        ]
    )
    out = (
        resample(
            raw,
            ["k"],
            "ts",
            "6 hours",
            aggs={"v": F.min("x"), "n": F.count(F.lit(1)).cast("long")},
            fills={"v": "locf", "n": "zero"},
        )
        .orderBy("ts")
        .collect()
    )
    assert [(r["v"], r["n"], r["is_gap"]) for r in out] == [
        (2.0, 2, False),
        (2.0, 0, True),
        (10.0, 1, False),
    ]


def test_resample_unfilled_agg_is_null_on_gaps(spark):
    from rspl_spark.operators.timeseries import resample

    raw = spark.createDataFrame(
        [Row(k="a", ts=_ts(0), x=1.0), Row(k="a", ts=_ts(13), x=2.0)]
    )
    out = (
        resample(
            raw,
            ["k"],
            "ts",
            "6 hours",
            aggs={"v": F.min("x"), "s": F.round(F.sum("x"), 6)},
            fills={"v": "locf"},
        )
        .orderBy("ts")
        .collect()
    )
    assert [r["s"] for r in out] == [1.0, None, 2.0]


def test_resample_validates_fill_columns(spark):
    from rspl_spark.operators.timeseries import resample

    raw = spark.createDataFrame([Row(k="a", ts=_ts(0), x=1.0)])
    with pytest.raises(ValueError, match="without an agg"):
        resample(raw, ["k"], "ts", "6 hours", {"v": F.min("x")}, {"zz": "locf"})


def test_resample_gate_scans_events_once(spark, ts_reg):
    plan = _executed_plan(ts_reg["q_resample"].fn(spark, SF))
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 1


def test_ewma_all_null_frame_yields_null_not_crash(spark):
    """Review fix: a key whose trailing frame holds only NULLs (e.g.
    its first observation is NULL) must yield NULL — unguarded,
    sequence(1, 0) descended and element_at killed the job."""
    import datetime as dt

    from rspl_spark.operators.timeseries import ewma

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", t0, None), ("k", t0 + dt.timedelta(hours=1), 2.0)],
        "k string, ts timestamp, v double",
    )
    rows = {r["ts"]: r["ewma"] for r in ewma(df, ["k"], "ts", "v").collect()}
    assert rows[t0] is None  # all-NULL frame
    assert rows[t0 + dt.timedelta(hours=1)] == 2.0  # NULL shrinks the window
