"""Property tests for the round-4 incremental/range operators: ANY
day-partitioning of a dataset merges to the one-pass answer, and ANY
bin width yields the exact range-join pairs. Hypothesis drives the
partitioning/bin choices; Spark work per example is kept tiny (local
frames, no IO)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from rspl_spark.operators import agg_store as A

MEASURES = {
    "n": ("v", "count"),
    "s": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}

# (key ∈ 3 values incl. None, int value) rows; splits into 1-3 days
rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", None]),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=1,
    max_size=14,
)
day_assign = st.lists(st.integers(min_value=0, max_value=2), min_size=14, max_size=14)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@_slow
@given(rows_strategy, day_assign)
def test_any_day_partition_merges_to_recompute(spark, rows, days):
    dfs = {}
    for idx, (k, v) in enumerate(rows):
        dfs.setdefault(days[idx], []).append((k, float(v)))
    batches = [
        spark.createDataFrame(rs, "k string, v double") for rs in dfs.values()
    ]
    store = "aggstore_prop"
    spark.sql("DROP TABLE IF EXISTS aggstore_prop")
    A.create_agg_store(spark, batches[0], store, ["k"], MEASURES, overwrite=True)
    try:
        for b in batches[1:]:
            A.merge_increment(spark, b, store, ["k"], MEASURES)
        got = {
            r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in A.read_final(spark, store).collect()
        }
        full = spark.createDataFrame(
            [(k, float(v)) for k, v in rows], "k string, v double"
        )
        want = {
            r["k"]: (r["n"], r["s"], r["lo"], r["hi"])
            for r in A.partial_agg(full, ["k"], MEASURES).collect()
        }
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS aggstore_prop")


points_strategy = st.lists(
    st.integers(min_value=0, max_value=5000), min_size=1, max_size=12, unique=True
)
intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=0, max_value=800),
    ),
    min_size=1,
    max_size=6,
)
bins = st.sampled_from([7, 60, 500, 3600])


@_slow
@given(points_strategy, intervals_strategy, bins)
def test_binned_range_join_equals_quadratic(spark, pts, ivs, bin_s):
    """Exactness is bin-width independent: the binned pairs equal the
    brute-force range predicate for arbitrary epoch-second data."""
    from rspl_spark.operators.rangejoin import point_in_interval_pairs

    # build frames directly from epoch seconds
    p = spark.createDataFrame(
        [(i, s) for i, s in enumerate(pts)], "pid long, sec long"
    ).select("pid", F.timestamp_seconds(F.col("sec")).alias("ts"))
    iv = spark.createDataFrame(
        [(i, a, a + w) for i, (a, w) in enumerate(ivs)],
        "iid long, a long, b long",
    ).select(
        "iid",
        F.timestamp_seconds(F.col("a")).alias("ts_start"),
        F.timestamp_seconds(F.col("b")).alias("ts_end"),
    )
    got = {
        (r["iid"], r["pid"])
        for r in point_in_interval_pairs(
            p, iv, start_ts="ts_start", end_ts="ts_end", bin_seconds=bin_s
        ).collect()
    }
    want = {
        (i, j)
        for i, (a, w) in enumerate(ivs)
        for j, s in enumerate(pts)
        if a <= s <= a + w
    }
    assert got == want
