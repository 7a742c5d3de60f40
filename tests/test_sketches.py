"""Mergeable-sketch operators (Apache DataSketches HLL, built into Spark
3.5+): the scale-native distinct-count path. Per SURVEY's determinism
rule, approximate results are tolerance-tested, not hash-gated — what IS
exact (and what matters at 1000 executors) is mergeability: partial
sketches combined with hll_union_agg must equal the one-shot sketch."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_hll_estimate_within_tolerance(spark):
    n = 100_000
    df = spark.range(n).select((F.col("id") % 20_000).alias("v"))
    est = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    assert abs(est - 20_000) / 20_000 < 0.05


def test_hll_sketches_merge_exactly(spark):
    """Partial per-group sketches unioned == one-shot sketch: the
    map-side-combine property that lets 1000 executors each sketch their
    partitions and ship bytes, not rows."""
    df = spark.range(50_000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 9_000).alias("v")
    )
    one_shot = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("g")
        .agg(F.hll_sketch_agg("v").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == one_shot


def test_hll_union_across_frames(spark):
    """Sketches survive materialization (binary column) and union across
    independently-built frames — incremental corpus stats without
    recomputing history."""
    a = spark.range(0, 30_000).select((F.col("id") % 5_000).alias("v"))
    b = spark.range(15_000, 60_000).select((F.col("id") % 5_000).alias("v"))
    ska = a.agg(F.hll_sketch_agg("v").alias("sk"))
    skb = b.agg(F.hll_sketch_agg("v").alias("sk"))
    est = (
        ska.unionByName(skb)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    # both frames cover the same 5000 distinct values
    assert abs(est - 5_000) / 5_000 < 0.05


# Count-min sketch: one-sided error, mergeability, exactness at width.


def test_cms_never_undershoots_and_exact_when_wide(spark):
    from rspl_spark.operators.sketches import cms_estimate, cms_sketch

    rows = [(w,) for w in "a b a c a b d e f a b c".split()]
    df = spark.createDataFrame(rows, "token string")
    truth = {r["token"]: r["n"] for r in df.groupBy("token").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    keys = df.distinct()
    # narrow sketch: estimates are upper bounds
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(cms_sketch(df, "token", w=4, d=2), keys,
                              "token", w=4, d=2).collect()
    }
    assert all(est[t] >= truth[t] for t in truth)
    # wide sketch (w >> vocab): collisions vanish, estimates are exact
    est_wide = {
        r["token"]: r["est"]
        for r in cms_estimate(cms_sketch(df, "token", w=1024, d=3), keys,
                              "token", w=1024, d=3).collect()
    }
    assert est_wide == truth
    # unseen key estimates 0 on the wide sketch
    ghost = spark.createDataFrame([("zzz",)], "token string")
    got = cms_estimate(cms_sketch(df, "token", w=1024, d=3), ghost,
                       "token", w=1024, d=3).collect()
    assert got[0]["est"] == 0


def test_cms_merge_equals_sketch_of_union(spark):
    from rspl_spark.operators.sketches import cms_merge, cms_sketch

    a = spark.createDataFrame([(w,) for w in "x y x z".split()], "token string")
    b = spark.createDataFrame([(w,) for w in "y z z w".split()], "token string")
    merged = {
        (r["i"], r["bucket"]): r["c"]
        for r in cms_merge(
            cms_sketch(a, "token", w=8, d=2), cms_sketch(b, "token", w=8, d=2)
        ).collect()
    }
    whole = {
        (r["i"], r["bucket"]): r["c"]
        for r in cms_sketch(a.unionByName(b), "token", w=8, d=2).collect()
    }
    assert merged == whole


def test_cms_weighted(spark):
    from rspl_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame([("a", 5), ("b", 2), ("a", 1)], "token string, w long")
    sk = cms_sketch(df, "token", w=512, d=3, weight_col="w")
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(sk, df.select("token").distinct(), "token",
                              w=512, d=3).collect()
    }
    assert est == {"a": 6, "b": 2}


def test_cms_daily_maintenance_through_agg_store(spark):
    """The persisted-partials composition: day-1 sketch cells seed the
    incremental aggregate store, day-2 cells merge in (bucket-aligned
    store-side scan, the agg_store machinery), and the stored sketch
    equals the batch sketch of both days' tokens — count-min cells are
    just another mergeable partial, so daily heavy-hitter maintenance
    rides the same store as the rollups."""
    from rspl_spark.operators import agg_store as A
    from rspl_spark.operators.sketches import cms_sketch

    day1 = spark.createDataFrame(
        [(w,) for w in "x y x z x".split()], "token string"
    )
    day2 = spark.createDataFrame(
        [(w,) for w in "y z z w y".split()], "token string"
    )
    measures = {"c": ("c", "sum")}
    store = "cms_store_t"
    A.create_agg_store(
        spark, cms_sketch(day1, "token", w=16, d=2), store,
        ["i", "bucket"], measures, overwrite=True,
    )
    try:
        A.merge_increment(
            spark, cms_sketch(day2, "token", w=16, d=2), store,
            ["i", "bucket"], measures,
        )
        got = {
            (r["i"], r["bucket"]): r["c"]
            for r in A.read_final(spark, store).collect()
        }
        want = {
            (r["i"], r["bucket"]): r["c"]
            for r in cms_sketch(day1.unionByName(day2), "token", w=16, d=2).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS cms_store_t")


# --- portable HLL (operators/sketches.py, q_approx_distinct_hll gate) -------


def test_portable_hll_accuracy(spark):
    """m=512 registers -> ~4.6% expected relative error; assert a 3x
    band on a 20k-distinct corpus (far above the linear-counting
    branch, i.e. the raw-formula path the gate exercises)."""
    from rspl_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.range(100_000).select((F.col("id") % 20_000).alias("v"))
    est = hll_estimate(hll_registers(df, "v")).collect()[0]["approx_distinct"]
    assert abs(est - 20_000) / 20_000 < 0.15


def test_portable_hll_registers_merge_by_max(spark):
    """Partial register tables merged with MAX == one-shot registers:
    the map-side-combine property (same contract the built-in
    DataSketches tests pin; here it is literally a groupBy max)."""
    from rspl_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.range(30_000).select(
        (F.col("id") % 4).alias("part"), (F.col("id") % 7_000).alias("v")
    )
    one_shot = hll_estimate(hll_registers(df, "v")).collect()[0]["approx_distinct"]
    merged_regs = (
        hll_registers(df, "v", ("part",))
        .groupBy("idx")
        .agg(F.max("mj").cast("long").alias("mj"))
    )
    merged = hll_estimate(merged_regs).collect()[0]["approx_distinct"]
    assert merged == one_shot


def test_portable_hll_small_range_branch(spark):
    """Tiny cardinality triggers linear counting (m * ln(m/V)), which
    is far more accurate than the raw formula there."""
    from rspl_spark.operators.sketches import hll_estimate, hll_registers

    df = spark.range(10_000).select((F.col("id") % 30).alias("v"))
    est = hll_estimate(hll_registers(df, "v")).collect()[0]["approx_distinct"]
    assert abs(est - 30) / 30 < 0.2


def test_portable_hll_register_bound(spark):
    """The register table never exceeds m rows per group — the bounded
    shuffle contract (the CMS analogue: cells <= d*w)."""
    from rspl_spark.operators.sketches import HLL_P, hll_registers

    df = spark.range(200_000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("v")
    )
    counts = (
        hll_registers(df, "v", ("g",))
        .groupBy("g")
        .count()
        .collect()
    )
    assert all(r["count"] <= (1 << HLL_P) for r in counts)


def test_hist_quantiles_accuracy_and_bound(spark):
    """Histogram quantile error is bounded by one bin width; assert the
    p50/p95 estimates land within 2 bins of the exact percentiles on a
    uniform corpus, and the bin table never exceeds nbins rows/group."""
    from rspl_spark.operators.sketches import hist_quantiles

    df = spark.range(100_000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 10_000).cast("double").alias("v")
    )
    nbins = 128
    est = {
        (r["g"], r["q"]): r["est"]
        for r in hist_quantiles(df, "v", (0.5, 0.95), ("g",), nbins=nbins).collect()
    }
    width = 9999.0 / nbins
    for g in (0, 1):
        exact = df.filter(F.col("g") == g).selectExpr(
            "percentile(v, 0.5) p50", "percentile(v, 0.95) p95"
        ).collect()[0]
        assert abs(est[(g, 0.5)] - exact["p50"]) <= 2 * width
        assert abs(est[(g, 0.95)] - exact["p95"]) <= 2 * width


def test_hist_quantiles_degenerate_group(spark):
    """A constant-valued group (hi == lo) estimates the constant for
    every q instead of dividing by zero width."""
    from rspl_spark.operators.sketches import hist_quantiles

    df = spark.range(100).select(F.lit("a").alias("g"), F.lit(7.5).alias("v"))
    rows = hist_quantiles(df, "v", (0.5, 0.99), ("g",)).collect()
    assert {(r["g"], r["q"], r["est"]) for r in rows} == {
        ("a", 0.5, 7.5), ("a", 0.99, 7.5)
    }


def test_sketches_ignore_null_keys_and_values(spark):
    """NULL keys/values follow COUNT(DISTINCT)/aggregate semantics:
    ignored. Before this guard, NULLs minted phantom HLL registers and
    CMS cells (consistently on both engines — semantically wrong, not
    a hash risk) and a NULL histogram bin sorted FIRST under Spark's
    cumulative window but LAST under DuckDB's ORDER BY — a latent
    cross-engine divergence on any nullable column."""
    from rspl_spark.operators.sketches import (
        cms_sketch,
        hist_quantiles,
        hll_estimate,
        hll_registers,
    )

    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.col("id") % 500).alias("k"),
        F.when(F.col("id") % 10 != 0, (F.col("id") % 100).cast("double")).alias("v"),
    )
    clean = df.filter(F.col("k").isNotNull())

    est_null = hll_estimate(hll_registers(df, "k")).collect()[0]["approx_distinct"]
    est_clean = hll_estimate(hll_registers(clean, "k")).collect()[0]["approx_distinct"]
    assert est_null == est_clean

    cells_null = {tuple(r) for r in cms_sketch(df, "k").collect()}
    cells_clean = {tuple(r) for r in cms_sketch(clean, "k").collect()}
    assert cells_null == cells_clean
    assert all(r[1] is not None for r in cells_null)

    q_null = {tuple(r) for r in hist_quantiles(df, "v", (0.5,)).collect()}
    q_clean = {tuple(r) for r in hist_quantiles(clean, "v", (0.5,)).collect()}
    assert q_null == q_clean


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom invariants: every inserted key probes member=1 (theorem,
    not tolerance); merge(a, b) == build(a ∪ b) bit-for-bit; state is
    bounded at ceil(m/60) words; the false-positive rate on a disjoint
    probe set sits near the analytic (1 - e^{-kn/m})^k."""
    import math

    from pyspark.sql import functions as F

    from rspl_spark.operators.sketches import bloom_build, bloom_merge, bloom_probe

    m, k = 1 << 14, 3
    a = spark.range(0, 700).select(F.concat(F.lit("in_a_"), "id").alias("key"))
    b = spark.range(0, 700).select(F.concat(F.lit("in_b_"), "id").alias("key"))
    absent = spark.range(0, 2000).select(F.concat(F.lit("out_"), "id").alias("key"))

    sk_a, sk_b = bloom_build(a, "key", m, k), bloom_build(b, "key", m, k)
    merged = bloom_merge(sk_a, sk_b)
    union_built = bloom_build(a.unionAll(b), "key", m, k)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in union_built.collect()
    }
    assert merged.count() <= -(-m // 60)

    members = bloom_probe(merged, a.unionAll(b), "key", m, k)
    assert members.filter(F.col("member") == 0).count() == 0  # no false negatives

    fp = bloom_probe(merged, absent, "key", m, k).filter(F.col("member") == 1).count()
    n = 1400
    expected = (1 - math.exp(-k * n / m)) ** k
    assert fp / 2000 < max(4 * expected, 0.05), f"fp rate {fp/2000} vs analytic {expected}"


def test_cms_topk_exact_matches_naive_on_skew(spark):
    """cms_topk_exact must be EXACT (same keys, counts, and tie-order
    as the naive aggregate) on a Zipf-ish skewed distribution — the
    shape it exists for — including when the seed threshold needs the
    driver-side refinement round."""
    from pyspark.sql import functions as F

    from rspl_spark.operators.sketches import cms_topk_exact

    # zipf-ish: key i appears ~ 3000/i times, 400 distinct keys
    rows = [(f"k{i:03d}",) for i in range(1, 400) for _ in range(3000 // i)]
    occ = spark.createDataFrame(rows, "term string").repartition(8)
    naive = [
        tuple(r)
        for r in occ.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(10)
        .collect()
    ]
    got = [tuple(r) for r in cms_topk_exact(occ, "term", k=10).collect()]
    assert got == naive
    # narrow sketch (w=32): heavy collisions force refinement, still exact
    got_narrow = [
        tuple(r) for r in cms_topk_exact(occ, "term", k=10, w=32).collect()
    ]
    assert got_narrow == naive
    # k larger than the vocabulary: returns every key, exact
    small = spark.createDataFrame([("a",), ("a",), ("b",)], "term string")
    got_small = [tuple(r) for r in cms_topk_exact(small, "term", k=10).collect()]
    assert got_small == [("a", 2), ("b", 1)]


def test_hll_intersect_estimate_accuracy_and_merge_law(spark):
    from pyspark.sql import functions as F

    from rspl_spark.operators.sketches import hll_intersect_estimate

    # |A| = 3000 (0..2999), |B| = 3000 (2000..4999), |A∩B| = 1000
    df = spark.range(5000).select(
        F.col("id"),
        (F.col("id") < 3000).alias("a"),
        (F.col("id") >= 2000).alias("b"),
    )
    r = hll_intersect_estimate(df, "id", F.col("a"), F.col("b")).first()
    assert abs(r["est_a"] - 3000) / 3000 < 0.08
    assert abs(r["est_b"] - 3000) / 3000 < 0.08
    assert abs(r["est_union"] - 5000) / 5000 < 0.08
    # intersection inherits three estimates' error — generous bound
    assert abs(r["est_intersect"] - 1000) / 1000 < 0.25
    assert r["est_intersect"] == round(r["est_a"] + r["est_b"] - r["est_union"], 2)


def test_cms_topk_exact_preserves_native_key_type(spark):
    """Non-string keys must come back at their NATIVE type on every
    return path (sketch rounds, empty input, fallback) — the schema is
    derived from the occurrences frame, not hardcoded string."""
    from pyspark.sql import functions as F

    from rspl_spark.operators.sketches import cms_topk_exact

    occ = spark.range(0, 2000).select(
        (F.col("id") % 7).cast("long").alias("item")
    )
    out = cms_topk_exact(occ, "item", k=3)
    assert dict(out.dtypes) == {"item": "bigint", "n": "bigint"}
    rows = [tuple(r) for r in out.collect()]
    naive = [
        tuple(r)
        for r in occ.groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("item"))
        .limit(3)
        .collect()
    ]
    assert rows == naive
    assert all(isinstance(r[0], int) for r in rows)

    empty = cms_topk_exact(occ.filter("item IS NULL"), "item", k=3)
    assert dict(empty.dtypes) == {"item": "bigint", "n": "bigint"}
    assert empty.count() == 0


def test_hll_empty_inputs_estimate_zero_not_null(spark):
    """Review fix: an empty register table (global agg) and an empty
    intersect side must estimate 0.0 via linear counting — unguarded,
    the NULL F.sum propagated into a NULL estimate."""
    from rspl_spark.operators.sketches import (
        hll_estimate,
        hll_intersect_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "k string")
    regs = hll_registers(empty, "k")
    row = hll_estimate(regs).collect()[0]
    assert row["approx_distinct"] == 0.0

    df = spark.createDataFrame(
        [(f"u{i}", "A") for i in range(200)], "k string, flag string"
    )
    r = hll_intersect_estimate(
        df, "k", F.col("flag") == "A", F.col("flag") == "B"
    ).collect()[0]
    assert r["est_b"] == 0.0  # empty side: 0.0, not NULL
    assert r["est_a"] > 0
    assert abs(r["est_intersect"]) < 1e-9  # a + 0 - union(=a)


def test_cms_weighted_excludes_nonpositive_weights(spark):
    """Review fix: NULL/zero/negative weights are excluded (documented),
    preserving the sketch's one-sided never-undershoot guarantee."""
    from rspl_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame(
        [("a", 5), ("a", -3), ("b", 2), ("b", None), ("c", 0)],
        "k string, w int",
    )
    sk = cms_sketch(df, "k", w=64, d=3, weight_col="w")
    keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    est = {r["k"]: r["est"] for r in cms_estimate(sk, keys, "k").collect()}
    assert est["a"] >= 5  # the -3 row did NOT subtract
    assert est["b"] >= 2
    assert est["c"] >= 0
