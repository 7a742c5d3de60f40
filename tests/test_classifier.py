"""Distributed logistic regression: convergence, partition invariance,
and the corpus gate's training dynamics."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators.classifier import logreg_fit, logreg_score


def test_logreg_learns_separable_data(spark):
    """On linearly separable data the fit must actually optimize:
    near-perfect accuracy after a few full-batch steps."""
    rng = np.random.default_rng(42)
    X = rng.normal(size=(400, 2))
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)],
        "f0 double, f1 double, y double",
    )
    feats = [F.col("f0"), F.col("f1")]
    w = logreg_fit(df, feats, F.col("y"), iters=25, lr=2.0)
    acc = (
        df.select(
            ((logreg_score(feats, w) >= 0.5).cast("double") == F.col("y"))
            .cast("int")
            .alias("ok")
        )
        .agg(F.avg("ok"))
        .first()[0]
    )
    assert acc >= 0.95, f"accuracy {acc}"
    # learned direction matches the generating hyperplane (w0 > w1 > 0)
    assert w[0] > 0 and w[1] > 0 and w[0] > w[1]


def test_logreg_partition_invariant(spark):
    """Gradient partials summed across 13 partitions reproduce the
    single-partition weights to float noise — the distributed pass is
    the same math."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(300, 2))
    y = (X[:, 0] > 0.2).astype(float)
    rows = [(float(a), float(b), float(t)) for (a, b), t in zip(X, y)]
    one = spark.createDataFrame(rows, "f0 double, f1 double, y double").coalesce(1)
    many = spark.createDataFrame(rows, "f0 double, f1 double, y double").repartition(13)
    feats = [F.col("f0"), F.col("f1")]
    w1 = logreg_fit(one, feats, F.col("y"), iters=5)
    w2 = logreg_fit(many, feats, F.col("y"), iters=5)
    assert np.allclose(w1, w2, rtol=0, atol=1e-9)


def test_logreg_empty_input_raises(spark):
    df = spark.createDataFrame([], "f0 double, y double")
    with pytest.raises(ValueError, match="empty"):
        logreg_fit(df, [F.col("f0")], F.col("y"), iters=1)


def test_quality_classifier_training_reduces_loss(spark):
    """On the documents corpus the log-loss must strictly improve from
    the w=0 start (0.6931) and accuracy must reach at least the
    majority-class rate — the classifier learns, it does not regress to
    the coin flip the zero-init starts from."""
    from rspl_spark.queries.curation import _lr_features

    d = load(spark, "/root/testdata/sf0.001", "documents")
    feats = _lr_features(d)
    y = F.col("lang") == "en"
    majority = (
        d.agg(F.avg((~y).cast("double"))).first()[0]
    )
    w = logreg_fit(d, feats, y, iters=3)
    s = logreg_score(feats, w)
    row = d.select(
        (((s >= 0.5) == y).cast("int")).alias("ok"),
        (
            -(
                y.cast("double") * F.log(s)
                + (1 - y.cast("double")) * F.log(1 - s)
            )
        ).alias("nll"),
    ).agg(F.avg("ok"), F.avg("nll")).first()
    assert row[1] < math.log(2) - 1e-4  # strictly better than w=0
    assert row[0] >= min(majority, 0.55)


def test_logreg_fit_drops_null_rows(spark):
    """Review fix: a NULL feature/label row must not NaN the whole
    gradient (all-NaN weights, 0.5 scores everywhere) — incomplete rows
    are dropped, matching the oracle's CASE/SUM NULL semantics."""
    import math

    from pyspark.sql import functions as F

    from rspl_spark.operators.classifier import logreg_fit

    df = spark.createDataFrame(
        [(1.0, 1.0), (0.0, 0.0), (None, 1.0), (2.0, None)] * 5,
        "x double, y double",
    )
    w = logreg_fit(df, [F.col("x")], F.col("y"), iters=2)
    assert all(math.isfinite(v) for v in w)
    # same weights as fitting the clean subset directly
    clean = df.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    w2 = logreg_fit(clean, [F.col("x")], F.col("y"), iters=2)
    assert w == w2
