"""KS drift statistic: known-answer cases, numpy cross-check, binning."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.drift import ks_statistic


def _ks_numpy(a: np.ndarray, b: np.ndarray) -> float:
    xs = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    return float(np.abs(fa - fb).max())


def test_ks_known_answers(spark):
    rows = [(float(v), "a") for v in [1, 2, 3, 4]] + [
        (float(v), "b") for v in [1, 2, 3, 4]
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    out = ks_statistic(df, "v", F.col("g") == "a", F.col("g") == "b").first()
    assert out["d_stat"] == 0.0  # identical samples
    assert (out["n_a"], out["n_b"]) == (4, 4)
    # disjoint supports → D = 1
    rows2 = [(float(v), "a") for v in [1, 2]] + [(float(v), "b") for v in [10, 11]]
    df2 = spark.createDataFrame(rows2, "v double, g string")
    assert ks_statistic(df2, "v", F.col("g") == "a", F.col("g") == "b").first()[
        "d_stat"
    ] == 1.0


def test_ks_matches_numpy_on_random_samples(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 300)
    b = rng.normal(0.4, 1.3, 200)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string").repartition(7)
    got = ks_statistic(df, "v", F.col("g") == "a", F.col("g") == "b").first()
    assert abs(got["d_stat"] - _ks_numpy(a, b)) < 1e-12
    assert (got["n_a"], got["n_b"]) == (300, 200)


def test_ks_binned_bounds_cardinality_and_approximates(spark):
    rng = np.random.default_rng(5)
    a = rng.normal(0, 1, 500)
    b = rng.normal(1.0, 1, 500)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string")
    exact = _ks_numpy(a, b)
    binned = ks_statistic(
        df, "v", F.col("g") == "a", F.col("g") == "b", bins=64
    ).first()["d_stat"]
    # histogram-KS underestimates by at most the per-bin mass
    assert binned <= exact + 1e-12
    assert binned > exact - 0.1


def test_ks_no_rows_raises_with_bins(spark):
    df = spark.createDataFrame([(1.0, "x")], "v double, g string")
    with pytest.raises(ValueError, match="no rows"):
        ks_statistic(df, "v", F.col("g") == "a", F.col("g") == "b", bins=8)


# ---------------------------------------------------------------------------
# PSI (Population Stability Index)
# ---------------------------------------------------------------------------

from rspl_spark.operators.drift import psi_bins, psi_statistic  # noqa: E402


def _psi_numpy(a: np.ndarray, b: np.ndarray, bins: int, s: float = 0.5) -> float:
    mn = float(min(a.min(), b.min()))
    mx = float(max(a.max(), b.max()))
    span = (mx - mn) or 1.0
    ba = np.minimum(np.floor((a - mn) * bins / span), bins - 1).astype(int)
    bb = np.minimum(np.floor((b - mn) * bins / span), bins - 1).astype(int)
    ca = np.bincount(ba, minlength=bins).astype(float)
    cb = np.bincount(bb, minlength=bins).astype(float)
    pa = (ca + s) / (len(a) + s * bins)
    pb = (cb + s) / (len(b) + s * bins)
    return float(((pa - pb) * np.log(pa / pb)).sum())


def test_psi_identical_samples_is_zero(spark):
    rows = [(float(v), g) for v in [1, 2, 3, 4, 8] for g in ("a", "b")]
    df = spark.createDataFrame(rows, "v double, g string")
    out = psi_statistic(df, "v", F.col("g") == "a", F.col("g") == "b", bins=8).first()
    assert out["psi"] == 0.0  # p == q in every bin
    assert (out["n_a"], out["n_b"]) == (5, 5)


def test_psi_matches_numpy_and_is_nonnegative_and_symmetric(spark):
    rng = np.random.default_rng(17)
    a = rng.normal(0, 1, 400)
    b = rng.normal(0.8, 1.4, 250)
    rows = [(float(v), "a") for v in a] + [(float(v), "b") for v in b]
    df = spark.createDataFrame(rows, "v double, g string").repartition(5)
    ab = psi_statistic(df, "v", F.col("g") == "a", F.col("g") == "b", bins=16).first()
    assert abs(ab["psi"] - _psi_numpy(a, b, 16)) < 1e-10
    assert ab["psi"] >= 0.0
    ba = psi_statistic(df, "v", F.col("g") == "b", F.col("g") == "a", bins=16).first()
    assert abs(ab["psi"] - ba["psi"]) < 1e-12  # term-wise symmetric


def test_psi_bins_full_spine_and_per_term_sign(spark):
    # two disjoint point masses: every other bin is empty on both sides
    rows = [(0.0, "a")] * 7 + [(15.0, "b")] * 3
    df = spark.createDataFrame(rows, "v double, g string")
    out = psi_bins(df, "v", F.col("g") == "a", F.col("g") == "b", bins=16).collect()
    assert len(out) == 16  # full spine, empty bins included
    assert all(r["contrib"] >= 0.0 for r in out)  # (p-q) and ln(p/q) share sign
    by_bin = {r["bin"]: r for r in out}
    assert (by_bin[0]["c_a"], by_bin[0]["c_b"]) == (7, 0)
    assert (by_bin[15]["c_a"], by_bin[15]["c_b"]) == (0, 3)
    # empty-on-both bins still contribute when n_a != n_b (smoothed mass differs)
    assert by_bin[7]["contrib"] > 0.0


def test_psi_input_validation(spark):
    df = spark.createDataFrame([(1.0, "a")], "v double, g string")
    with pytest.raises(ValueError, match="at least 2 bins"):
        psi_bins(df, "v", F.col("g") == "a", F.col("g") == "b", bins=1)
    with pytest.raises(ValueError, match="smoothing"):
        psi_bins(df, "v", F.col("g") == "a", F.col("g") == "b", smoothing=0.0)
    with pytest.raises(ValueError, match="no rows"):
        psi_statistic(df, "v", F.col("g") == "x", F.col("g") == "y").collect()


# ---------------------------------------------------------------------------
# rate anomalies
# ---------------------------------------------------------------------------


def test_rate_anomalies_flags_spike_exactly(spark):
    import pandas as pd

    from rspl_spark.operators.drift import rate_anomalies

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    # key 'a': 24 calm minutes of 2 events, one minute with 40. NOTE the
    # population-stats ceiling: ONE outlier among n buckets caps at
    # z = sqrt(n-1) exactly (with 10 buckets a lone spike IS 3.000...σ
    # and strict > refuses it) — 25 buckets give headroom sqrt(24)≈4.9.
    for m in range(24):
        rows += [("a", t0 + pd.Timedelta(minutes=m, seconds=s)) for s in (1, 2)]
    rows += [("a", t0 + pd.Timedelta(minutes=24, seconds=s)) for s in range(40)]
    # key 'b': constant rate — zero variance, nothing may flag
    for m in range(5):
        rows += [("b", t0 + pd.Timedelta(minutes=m, seconds=s)) for s in (1, 2, 3)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts"]))
    out = rate_anomalies(df, "ts", ["k"], bucket="minute", z=3).collect()
    a_flags = {str(r["bucket_ts"]): r["flag"] for r in out if r["k"] == "a"}
    assert sum(a_flags.values()) == 1
    assert a_flags[str(t0 + pd.Timedelta(minutes=24))] == 1
    assert all(r["flag"] == 0 for r in out if r["k"] == "b")
    # numpy cross-check of the integer algebra on key 'a'
    counts = sorted(r["n"] for r in out if r["k"] == "a")
    assert counts == [2] * 24 + [40]


def test_rate_anomalies_single_bucket_and_validation(spark):
    import pandas as pd
    import pytest as _pytest

    from rspl_spark.operators.drift import rate_anomalies

    df = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "ts": [pd.Timestamp("2024-01-01")]})
    )
    out = rate_anomalies(df, "ts", ["k"], bucket="minute").collect()
    assert len(out) == 1 and out[0]["flag"] == 0  # variance undefined -> no flag
    with _pytest.raises(ValueError, match="z must be"):
        rate_anomalies(df, "ts", ["k"], z=0)


# ---------------------------------------------------------------------------
# chi-square independence
# ---------------------------------------------------------------------------


def test_chi_square_matches_scipy_formula_and_independent_is_zero(spark):
    from rspl_spark.operators.drift import chi_square

    # perfectly independent 2x2: chi2 == 0
    rows = [("x", "p")] * 6 + [("x", "q")] * 2 + [("y", "p")] * 3 + [("y", "q")] * 1
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, "a", "b").first()
    assert r["chi2"] == 0.0 and r["dof"] == 1 and r["n"] == 12

    # skewed table: cross-check against the numpy expected-counts formula
    rows2 = [("x", "p")] * 20 + [("x", "q")] * 5 + [("y", "p")] * 4 + [("y", "q")] * 11
    df2 = spark.createDataFrame(rows2, "a string, b string")
    got = chi_square(df2, "a", "b").first()
    obs = np.array([[20, 5], [4, 11]], dtype=float)
    n = obs.sum()
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / n
    want = ((obs - exp) ** 2 / exp).sum()
    assert abs(got["chi2"] - want) < 1e-6
    assert got["dof"] == 1


def test_chi_square_null_level_and_zero_cells(spark):
    from rspl_spark.operators.drift import chi_square

    # NULL is a real category; ('y','q') never occurs -> observed-zero
    # cell still contributes E
    rows = [("x", "p"), ("x", None), ("y", "p"), ("x", "p")]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, "a", "b").first()
    assert r["n"] == 4 and r["dof"] == 1
    obs = np.array([[2, 1], [1, 0]], dtype=float)  # rows x, y; cols p, NULL
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / 4
    want = ((obs - exp) ** 2 / exp).sum()
    assert abs(r["chi2"] - want) < 1e-6  # operator rounds to 6dp
