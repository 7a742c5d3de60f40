"""k-means operator: Lloyd invariants on real embeddings."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators.similarity import kmeans_assign, kmeans_fit


def _inertia(spark, df, centroids):
    return kmeans_assign(df, centroids).agg(F.sum("dist2")).collect()[0][0]


def test_kmeans_inertia_monotone(spark):
    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    c0 = kmeans_fit(e, k=4, iters=0)
    c1 = kmeans_fit(e, k=4, iters=1)
    c3 = kmeans_fit(e, k=4, iters=3)
    i0, i1, i3 = (_inertia(spark, e, c) for c in (c0, c1, c3))
    assert i1 <= i0 + 1e-6
    assert i3 <= i1 + 1e-6


def test_kmeans_deterministic(spark):
    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    a = kmeans_fit(e, k=4, iters=2)
    b = kmeans_fit(e, k=4, iters=2)
    assert a == b
    pa = kmeans_assign(e, a).toPandas()
    pb = kmeans_assign(e, b).toPandas()
    assert pa.equals(pb)


def test_kmeans_matches_numpy(spark):
    """One Lloyd iteration cross-checked against a numpy reference."""
    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    rows = e.orderBy("vec_id").collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    k = 4
    cent = X[:k].copy()
    # numpy Lloyd step
    d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    want = np.array(
        [X[assign == ci].mean(axis=0) if (assign == ci).any() else cent[ci] for ci in range(k)]
    )
    got = np.array(kmeans_fit(e, k=k, iters=1))
    assert np.allclose(got, want, atol=1e-9)
