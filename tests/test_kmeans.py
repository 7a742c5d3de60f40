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


def test_sq_dists_chunked_bit_identical():
    """The cache-blocked distance kernel must be BIT-identical to the
    one-shot broadcast form at every shape class it runs at: chunking
    the row axis may not change any (row, centroid) cell's reduction
    order (the DuckDB oracle twins replay argmin ties exactly)."""
    from rspl_spark.operators.similarity import _sq_dists

    rng = np.random.default_rng(7)
    for n, k, d in [(0, 8, 16), (1, 8, 16), (15, 8, 16), (2000, 62, 64),
                    (5000, 8, 64), (4097, 64, 64)]:
        M = rng.standard_normal((n, d))
        C = rng.standard_normal((k, d))
        want = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        got = _sq_dists(M, C)
        assert got.shape == (n, k)
        assert np.array_equal(got, want)
    # dtype agreement across branches (r15 ADVICE): a float32 caller
    # gets float32 from BOTH the one-shot and the chunked path
    for n in (10, 5000):  # one-shot branch, chunked branch
        M = rng.standard_normal((n, 16)).astype(np.float32)
        C = rng.standard_normal((64, 16)).astype(np.float32)
        got = _sq_dists(M, C)
        want = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assert got.dtype == want.dtype == np.float32
        assert np.array_equal(got, want)


def test_kmeans_sampled_fit_parity(spark):
    """Sampled fit (deterministic md5 hash-sample) vs full fit on the
    gate corpus: same k, same iterations — the sampled centroids'
    full-corpus inertia must be within a small factor of the full
    fit's (sampling only adds centroid placement noise, never a
    qualitatively worse clustering). Also: the sampled fit is
    deterministic, and an undersized sample falls back to the full
    fit."""
    e = load(spark, "/root/testdata/sf0.01", "embeddings").localCheckpoint()
    full = kmeans_fit(e, k=8, iters=2)
    sampled = kmeans_fit(e, k=8, iters=2, sample_frac=0.5)
    assert sampled != full  # the sample genuinely changed the fit input
    i_full = _inertia(spark, e, full)
    i_samp = _inertia(spark, e, sampled)
    assert i_samp <= i_full * 1.15, (i_full, i_samp)
    # deterministic: no RNG anywhere in the sample or the fit
    assert kmeans_fit(e, k=8, iters=2, sample_frac=0.5) == sampled
    # a sample too small to seed k centroids falls back to the full fit
    tiny = kmeans_fit(e, k=400, iters=0, sample_frac=0.0004)
    assert tiny == kmeans_fit(e, k=400, iters=0)


def test_semantic_dedup_adaptive_uses_sampled_fit(spark):
    """Above max_k the adaptive path keeps k at the cap and fits on a
    hash-sample sized to max_k * target_cell rows — result still
    covers every vector and stays a valid decision table."""
    from rspl_spark.operators.similarity import semantic_dedup

    e = load(spark, "/root/testdata/sf0.01", "embeddings").localCheckpoint()
    # force the over-cap path on the 500-row corpus: target_cell=16
    # wants ~31 cells, max_k=16 caps it -> fit_frac = 16*16/500 ≈ 0.512
    out = semantic_dedup(e, threshold=0.4, target_cell=16, max_k=16, iters=1)
    rows = out.collect()
    assert len(rows) == e.count()  # one decision per input vector
    keep = sum(r["keep"] for r in rows)
    assert 0 < keep <= len(rows)
