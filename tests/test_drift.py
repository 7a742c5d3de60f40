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
