"""Expression cosine ≡ pandas-UDF cosine on real embeddings; numpy is the
independent referee."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators.similarity import cosine_expr, cosine_pandas


def test_cosine_kernels_agree(spark):
    e = load(spark, "/root/testdata/sf0.001", "embeddings").limit(64)
    a = e.select(F.col("vec_id"), F.col("embedding").alias("a"))
    b = e.select(F.col("vec_id").alias("vid2"), F.col("embedding").alias("b"))
    pairs = a.join(b, a.vec_id == b.vid2 - 1)  # consecutive pairs
    both = pairs.select(
        "vec_id",
        cosine_expr(F.col("a"), F.col("b")).alias("c_expr"),
        cosine_pandas(
            F.transform("a", lambda x: x.cast("double")),
            F.transform("b", lambda x: x.cast("double")),
        ).alias("c_pudf"),
    ).collect()
    assert len(both) > 10
    for r in both:
        assert r["c_expr"] == pytest.approx(r["c_pudf"], abs=1e-12)


def test_quantizer_zero_vector_yields_null(spark):
    """ANSI-safety: a zero-norm vector quantizes to NULL, not a
    DIVIDE_BY_ZERO crash (same guard class as cosine)."""
    import pyspark.sql.functions as F

    e = spark.createDataFrame(
        [(0, [0.0] * 4), (1, [1.0, -2.0, 0.5, 3.0])], "vec_id long, embedding array<float>"
    )
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.nullif(F.array_max(F.transform(dbl, lambda x: F.abs(x))) / 127.0, F.lit(0.0))
    st = e.select("vec_id", "embedding", scale.alias("scale_raw"))
    q1 = F.floor(
        F.element_at(F.col("embedding"), 1).cast("double") / F.col("scale_raw") + 0.5
    ).cast("long")
    got = {r["vec_id"]: r["q"] for r in st.select("vec_id", q1.alias("q")).collect()}
    assert got[0] is None and got[1] == 42


def test_cosine_against_numpy(spark):
    rows = load(spark, "/root/testdata/sf0.001", "embeddings").limit(3).collect()
    v0 = np.array(rows[0]["embedding"], dtype=np.float64)
    v1 = np.array(rows[1]["embedding"], dtype=np.float64)
    want = float(v0 @ v1 / (np.linalg.norm(v0) * np.linalg.norm(v1)))
    df = spark.createDataFrame(
        [(rows[0]["embedding"], rows[1]["embedding"])], "a array<float>, b array<float>"
    )
    got = df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"]
    assert got == pytest.approx(want, abs=1e-9)


def test_ivf_trained_recall_vs_bruteforce(spark):
    """Trained-codebook IVF must recover >= 0.8 of the true (brute-force)
    top-5 neighbors on the testdata — the point of training the cells."""
    from rspl_spark.queries import load_registry

    reg = load_registry()
    sf = "/root/testdata/sf0.001"
    truth = {}
    for r in reg["q_cosine_topk_bruteforce"].fn(spark, sf).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in reg["q_cosine_topk_ivf_trained"].fn(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total == 50
    recall = hits / total
    assert recall >= 0.8, f"recall@5 = {recall}"


def test_srp_lsh_recall_vs_bruteforce(spark):
    """SRP/LSH-bucketed ANN: 2x8-bit bands on 16 hyperplanes must still
    recover a usable fraction of the true top-5 on the testdata. The
    floor is lower than IVF's (bucketing is data-oblivious), but a
    collapse would mean the sketch or banding is broken."""
    from rspl_spark.queries import load_registry

    reg = load_registry()
    sf = "/root/testdata/sf0.001"
    truth = {}
    for r in reg["q_cosine_topk_bruteforce"].fn(spark, sf).collect():
        truth.setdefault(r["query_id"], set()).add(r["vec_id"])
    got = {}
    for r in reg["q_cosine_topk_srp"].fn(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total == 50
    recall = hits / total
    assert recall >= 0.3, f"recall@5 = {recall}"


def test_pq_encode_matches_numpy_replay(spark):
    """pq_encode's Arrow kernel must agree with a direct numpy replay of
    the same codebooks (argmin of squared L2 per subspace, ties→lowest)."""
    from rspl_spark.operators.similarity import pq_encode, pq_fit

    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    cbs = pq_fit(e, m=8, k=16, iters=2)
    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(e, cbs).collect()}
    rows = e.select("vec_id", "embedding").orderBy("vec_id").limit(50).collect()
    C = [np.asarray(cb) for cb in cbs]
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        expect = [
            int(np.argmin(((v[s * 8 : (s + 1) * 8] - C[s]) ** 2).sum(axis=1)))
            for s in range(8)
        ]
        assert got[r["vec_id"]] == expect


def test_pq_adc_topk_partition_invariance(spark):
    """Per-partition top-k + global merge must equal the single-partition
    answer — the distributed shape changes nothing."""
    from rspl_spark.operators.similarity import pq_adc_topk, pq_encode, pq_fit

    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    cbs = pq_fit(e, m=8, k=16, iters=2)
    enc = pq_encode(e, cbs)
    qrows = e.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]
    one = pq_adc_topk(enc.coalesce(1), cbs, queries, topk=7).collect()
    many = pq_adc_topk(enc.repartition(13), cbs, queries, topk=7).collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_pq_rerank_recall_vs_exact_ip(spark):
    """The gate's two-stage shape (ADC shortlist=100 of 500, exact IP
    rerank) must recover >= 0.8 of the true inner-product top-5 — the
    compression would be pointless if the shortlist lost the answers."""
    from rspl_spark.queries import load_registry

    reg = load_registry()
    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    rows = e.select("vec_id", "embedding").orderBy("vec_id").collect()
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    got = {}
    for r in reg["q_ann_pq_adc"].fn(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = tot = 0
    for qi in range(10):
        ip = M @ M[qi]
        ip[qi] = -np.inf
        top = set(ids[np.argsort(-ip, kind="stable")[:5]].tolist())
        hits += len(top & got[int(ids[qi])])
        tot += 5
    recall = hits / tot
    assert recall >= 0.8, f"reranked recall@5 = {recall}"


def test_semantic_dedup_decision_table(spark):
    """Every vector appears exactly once; representatives are cluster
    minima; keep=1 iff representative; paired duplicates share clusters
    consistent with q_embedding_cosine_pairs' edges."""
    from rspl_spark.operators.similarity import semantic_dedup
    from rspl_spark.queries import load_registry

    reg = load_registry()
    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings")
    out = semantic_dedup(e).collect()
    assert len(out) == e.count()
    by_id = {r["vec_id"]: r for r in out}
    for r in out:
        assert r["cluster"] <= r["vec_id"]
        assert r["keep"] == (1 if r["cluster"] == r["vec_id"] else 0)
    # edges from the pair gate must be intra-cluster
    for p in reg["q_embedding_cosine_pairs"].fn(spark, sf).collect():
        assert by_id[p["vec_a"]]["cluster"] == by_id[p["vec_b"]]["cluster"]


def test_random_projection_preserves_distances(spark):
    """JL property: squared pairwise distances in the 16-dim projection
    track the 64-dim originals — rank correlation strongly positive and
    the mean distance ratio near 1 (the projection is scaled to be an
    unbiased distance estimator)."""
    from rspl_spark.operators.similarity import random_projection

    # Structured data with 10x distance variation (the testdata corpus
    # is near-iid, where ALL 64-d pairwise distances concentrate to the
    # same value and correlation is pure noise — measured 0.19 there).
    # Cluster directions drawn randomly: the deterministic ±1 rows are
    # near-balanced (row sums ~0), so CONSTANT offset vectors are an
    # adversarial input any fixed matrix has — the all-ones direction
    # projects to ~0 and distances collapse (measured ratio 0.32).
    rng = np.random.default_rng(3)
    centers = 2.0 * rng.normal(size=(3, 64))
    pts = np.concatenate(
        [c + 0.3 * rng.normal(size=(20, 64)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    proj = {
        r["vec_id"]: np.asarray(r["projected"], dtype=np.float64)
        for r in random_projection(df, 16, 64).collect()
    }
    d_orig, d_proj = [], []
    for i in range(0, 60, 2):
        for j in range(1, 60, 7):
            if i != j:
                d_orig.append(((pts[i] - pts[j]) ** 2).sum())
                d_proj.append(((proj[i] - proj[j]) ** 2).sum())
    d_orig, d_proj = np.asarray(d_orig), np.asarray(d_proj)
    ratio = (d_proj / d_orig).mean()
    assert 0.7 < ratio < 1.3, f"mean distance ratio {ratio}"
    corr = np.corrcoef(d_orig, d_proj)[0, 1]
    assert corr > 0.9, f"distance correlation {corr}"


def test_pca_power_matches_eigh_direction(spark):
    """Three power steps from the fixed start must land close to the true
    top eigenvector (numpy eigh on the same covariance), up to sign —
    and the variance captured along the returned direction must match
    the top eigenvalue within a few percent."""
    from rspl_spark.operators.similarity import pca_power_fit, pca_project

    rng = np.random.default_rng(9)
    # anisotropic cloud: one dominant direction
    base = rng.normal(size=(300, 8))
    base[:, 2] *= 6.0
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(base)],
        "vec_id long, embedding array<double>",
    )
    mu, comp = pca_power_fit(df, iters=3)
    X = base - base.mean(axis=0)
    cov = X.T @ X / len(base)
    vals, vecs = np.linalg.eigh(cov)
    top = vecs[:, -1]
    cosang = abs(float(np.dot(top, np.asarray(comp))))
    assert cosang > 0.99, f"|cos| to eigh top = {cosang}"
    projs = np.array(
        [r["proj"] for r in pca_project(df, mu, comp).orderBy("vec_id").collect()]
    )
    assert abs(projs.var() / vals[-1] - 1) < 0.05
    # partition invariance of the single-pass covariance
    mu2, comp2 = pca_power_fit(df.repartition(13), iters=3)
    assert np.allclose(comp, comp2, atol=1e-9)


def test_pca_power_empty_raises(spark):
    from rspl_spark.operators.similarity import pca_power_fit

    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(Exception):
        pca_power_fit(df)


def test_cell_cosine_pairs_blocked_parity_and_bound(spark):
    """The triangle-join grid (bounded per-task memory for skewed cells)
    emits exactly the unblocked kernel's pairs: forced blocking
    (max_cell_rows far below the cell sizes) must change the plan, not
    the answer. Also checks B=1 degeneration on a loose bound."""
    from rspl_spark.catalog import load
    from rspl_spark.operators.similarity import (
        cell_cosine_pairs,
        cell_cosine_pairs_blocked,
        kmeans_assign,
        kmeans_fit,
        unit_prep,
    )

    e = load(spark, "/root/testdata/sf0.01", "embeddings")
    cents = kmeans_fit(e, k=4, iters=1)
    prepped = (
        unit_prep(e, "vec_id", "emb", "nrm")
        .join(kmeans_assign(e, cents).select("vec_id", "cid"), "vec_id")
        .localCheckpoint()
    )

    def canon(df):
        return {
            (r["vec_id_a"], r["vec_id_b"], round(r["raw_score"], 9))
            for r in df.collect()
        }

    want = canon(cell_cosine_pairs(prepped, min_raw=0.3))
    got_forced = canon(
        cell_cosine_pairs_blocked(prepped, max_cell_rows=37, min_raw=0.3)
    )
    got_loose = canon(
        cell_cosine_pairs_blocked(prepped, max_cell_rows=10**6, min_raw=0.3)
    )
    assert got_forced == want
    assert got_loose == want
    assert len(want) > 0


# ---------------------------------------------------------------------------
# int8 scalar quantization + quantized top-k
# ---------------------------------------------------------------------------


def test_int8_encode_roundtrip_error_bound(spark):
    from rspl_spark.operators.similarity import int8_encode

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    enc = int8_encode(e).join(
        e.select(F.col("vec_id").alias("id"), "embedding"), "id"
    )
    rows = enc.collect()
    assert len(rows) > 50
    for r in rows:
        assert r["scale"] is not None
        x = np.array([float(v) for v in r["embedding"]])
        q = np.array(r["codes"], dtype=np.int64)
        assert np.abs(q).max() <= 127  # tinyint-safe
        # reconstruction error of round-to-nearest is <= scale/2 per coord
        assert np.abs(x - q * r["scale"]).max() <= r["scale"] / 2 + 1e-12


def test_int8_encode_zero_vector_is_null(spark):
    from rspl_spark.operators.similarity import int8_encode

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, -2.0])], "vec_id long, embedding array<double>"
    )
    out = {r["id"]: r for r in int8_encode(df).collect()}
    assert out[1]["scale"] is None and out[1]["codes"] is None
    assert out[2]["codes"] == [64, -127]  # 1/(2/127) = 63.5 -> floor(+0.5) = 64


def test_int8_topk_recall_vs_bruteforce(spark):
    from rspl_spark.operators.similarity import int8_topk, unit_prep, exact_scored_pairs
    from pyspark.sql.window import Window

    e = load(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    got = int8_topk(e, q, k=5, candidates=32)
    mine = {(r["query_id"], r["vec_id"]) for r in got.collect()}

    cand = unit_prep(e, "vec_id", "a_emb", "a_nrm")
    probes = unit_prep(q, "query_id", "b_emb", "b_nrm")
    scored = (
        exact_scored_pairs(cand, probes, "s", allow_quadratic=True)
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("vec_id"))
    exact = {
        (r["query_id"], r["vec_id"])
        for r in scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    }
    assert len(exact) == 100
    recall = len(mine & exact) / len(exact)
    assert recall >= 0.9  # int8 selection keeps the true top-5 almost always


def test_int8_topk_k_validation(spark):
    from rspl_spark.operators.similarity import int8_topk

    e = load(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="k must be <= candidates"):
        int8_topk(e, e.limit(1), k=10, candidates=5)


def test_cosine_pandas_float32_matches_expr(spark):
    """Review fix: cosine_pandas casts to float64 like its siblings, so
    an array<float> column scores identically (to round-6) under both
    kernels — the documented interchangeability."""
    rows = [([0.1234567, 0.7654321, 0.3333333], [0.9999999, 0.0000001, 0.5])]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = df.select(
        F.round(cosine_pandas("a", "b"), 6).alias("p"),
        F.round(cosine_expr("a", "b"), 6).alias("e"),
    ).collect()[0]
    assert got["p"] == got["e"]


def test_cell_cosine_pairs_string_ids(spark):
    """Review fix: the pair schema derives the id type from the input
    (hardcoded long crashed string doc ids at Arrow conversion)."""
    from rspl_spark.operators.similarity import cell_cosine_pairs, unit_prep

    rows = [
        ("doc-a", [1.0, 0.0]),
        ("doc-b", [1.0, 0.0]),
        ("doc-c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    prep = unit_prep(df, "doc_id", "emb", "nrm", id_col="doc_id").withColumn(
        "cid", F.lit(0)
    )
    pairs = {
        (r["doc_id_a"], r["doc_id_b"], round(r["raw_score"], 6))
        for r in cell_cosine_pairs(prep, id_col="doc_id").collect()
    }
    assert ("doc-a", "doc-b", 1.0) in pairs
    assert len(pairs) == 3
