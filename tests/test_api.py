"""Fluent facade + alternate-maps compilation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.api import stream_of
from rspl_spark.dsl import alternate, compile_batch, eval_sp, filter_sp, map_sp
from rspl_spark.dsl.compiler import CompileError
from rspl_spark.dsl.interpreter import to_stream_df


def test_fluent_compiled(spark):
    df = to_stream_df(spark, range(20))
    out = (
        stream_of(df)
        .filter(lambda v: v % 2 == 0)
        .map(lambda v: v * 10)
        .to_df()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # compiled path
    vals = [r["value"] for r in out.orderBy("seq").collect()]
    assert vals == [v * 10 for v in range(20) if v % 2 == 0]


def test_fluent_falls_back_to_interpreter(spark):
    df = to_stream_df(spark, [0, 1, 2, -1, -2, 1])
    out = (
        stream_of(df)
        .then(alternate(filter_sp(lambda v: v > 0), filter_sp(lambda v: v < 0)))
        .to_df(out_type="long")
    )
    assert [r["value"] for r in out.orderBy("seq").collect()] == [1, -1, 1]


def test_fluent_stateful_requires_out_type(spark):
    df = to_stream_df(spark, [1, 2])
    st = stream_of(df).then(alternate(filter_sp(lambda v: v > 0), filter_sp(lambda v: v < 0)))
    with pytest.raises(CompileError):
        st.to_df()


def test_fluent_keyed_interpretation(spark):
    rows = [(k, i, k * 100 + i) for k in range(3) for i in range(4)]
    df = spark.createDataFrame(rows, "key long, seq long, value long")
    out = (
        stream_of(df, key_col="key")
        .filter(lambda v: v % 2 == 0)
        .map(lambda v: v + 1)
        .to_df(out_type="long")
    )
    got = {
        k: [r["value"] for r in out.filter(F.col("key") == k).orderBy("seq").collect()]
        for k in range(3)
    }
    for k in range(3):
        vals = [k * 100 + i for i in range(4)]
        assert got[k] == [v + 1 for v in vals if v % 2 == 0]


def test_alternate_maps_compiles(spark):
    """alternate(map f, map g): position-aligned → compiled to a parity
    expression; result must equal the pure evaluator."""
    sp = alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1))
    vals = list(range(9))
    df = to_stream_df(spark, vals)
    out = compile_batch(sp, df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    got = [r["value"] for r in out.orderBy("seq").collect()]
    want = list(eval_sp(alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1)), vals))
    assert got == want == [0, 2, 20, 4, 40, 6, 60, 8, 80]


def test_alternate_with_filters_still_interpreted(spark):
    sp = alternate(filter_sp(lambda v: v > 0), map_sp(lambda v: v))
    with pytest.raises(CompileError):
        compile_batch(sp, to_stream_df(spark, [1, 2]))


def test_to_df_seq_contract_unified(spark):
    """Both execution paths yield DENSE output seq from 0 for the same
    term — previously the compiled path kept source ordinals (gaps after
    filters) while the interpreter renumbered, a trap for downstream
    joins/windows on seq."""
    df = to_stream_df(spark, range(20))
    pipe = stream_of(df).filter(lambda v: v % 2 == 0).map(lambda v: v * 10)
    compiled = pipe.to_df()
    interpreted = pipe.then(
        # a no-op Get/Put FSM forces the interpreter path
        map_sp(lambda v: v, py_fn=lambda v: v)
    )
    c = [(r["seq"], r["value"]) for r in compiled.orderBy("seq").collect()]
    assert [s for s, _ in c] == list(range(10))  # dense, 0-based
    # opt-out keeps the raw source ordinals (gap pattern of the filter)
    raw = pipe.to_df(dense_seq=False)
    assert [r["seq"] for r in raw.orderBy("seq").collect()] == list(range(0, 20, 2))


def test_alternate_maps_scalable_ordinal(spark):
    """The alternate(map,map) lowering must not rely on a single-task
    global window: result is correct even when the input arrives in
    arbitrary partition order, via range-partitioned dense ordinals."""
    sp = alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1))
    vals = list(range(101))
    # scramble physical layout: repartition destroys any input ordering
    df = to_stream_df(spark, vals).repartition(7)
    out = compile_batch(sp, df)
    got = [r["value"] for r in out.orderBy("seq").collect()]
    want = list(eval_sp(alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1)), vals))
    assert got == want
    # dense_seq fast path: same result, zero ordinal computation
    got2 = [
        r["value"]
        for r in compile_batch(sp, df, dense_seq=True).orderBy("seq").collect()
    ]
    assert got2 == want


def test_dense_input_skips_renumber_and_serial_window(spark):
    """dense_input=True on a length-preserving term: the compiled plan
    must contain NO window at all (seq passes through), and a filtering
    term must renumber via the partitioned parallel ordinal, never an
    unpartitioned global window."""
    vals = list(range(50))
    df = to_stream_df(spark, vals)

    # length-preserving: alternate(map,map) — seq passthrough, no window
    out = stream_of(df, dense_input=True)._with(
        alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1))
    ).to_df()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "row_number" not in plan
    got = [r["value"] for r in out.orderBy("seq").collect()]
    assert got == list(eval_sp(alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1)), vals))

    # gap-producing term: renumbered, but only by PARTITIONED windows
    filt = (
        stream_of(df, dense_input=True)
        .filter(lambda v: v % 2 == 0, expr_fn=lambda c: c % 2 == 0)
        .to_df()
    )
    fplan = filt._jdf.queryExecution().executedPlan().toString()
    import re as _re
    for m in _re.finditer(r"windowspecdefinition\(([^)]*)\)", fplan):
        assert m.group(1).strip().startswith("_pid") or "," in m.group(1)
    assert [r["seq"] for r in filt.orderBy("seq").collect()] == list(range(25))


def test_py_only_fn_falls_back_to_interpreter(spark):
    """A stage built with py_fn only is interpreter-only: the compiler
    must raise CompileError (not TypeError mid-compile), and to_df with
    out_type must reach the interpreter. A one-lambda Python-only
    function likewise falls back when out_type sanctions it."""
    import math

    vals = [1, 2, 3, 4]
    df = to_stream_df(spark, vals)
    out = (
        stream_of(df)
        .map(lambda v: v, py_fn=lambda v: math.factorial(v))
        .to_df(out_type="long")
    )
    assert [r["value"] for r in out.orderBy("seq").collect()] == [1, 2, 6, 24]

    # one polymorphic-LOOKING lambda that is actually Python-only
    out2 = stream_of(df).map(lambda v: math.factorial(v)).to_df(out_type="long")
    assert [r["value"] for r in out2.orderBy("seq").collect()] == [1, 2, 6, 24]

    # without out_type the real error surfaces (not swallowed)
    import pytest as _pytest
    with _pytest.raises(Exception):
        stream_of(df).map(lambda v: math.factorial(v)).to_df()


def test_alternate_with_preserves_dense_input(spark):
    """alternate_with must forward the dense-input declaration so the
    compiled alternate uses seq parity directly — no ordinal machinery,
    no window in the plan."""
    vals = list(range(20))
    df = to_stream_df(spark, vals)
    out = (
        stream_of(df, dense_input=True)
        .map(lambda v: v * 10)
        .alternate_with(map_sp(lambda v: v + 1))
        .to_df()
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "row_number" not in plan
    want = list(
        eval_sp(alternate(map_sp(lambda v: v * 10), map_sp(lambda v: v + 1)), vals)
    )
    got = [r["value"] for r in out.orderBy("seq").collect()]
    assert got == want


# ------------------------------------------------------------------ analytics
# r11: the table-level facade — every analytic family discoverable from
# one entry point, each method a thin binding of the operator module
# that owns the semantics (result equality asserted against the direct
# operator call, plus chainability into plain DataFrame ops).


def _edges(spark):
    return spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (1, 3)], "src long, dst long"
    )


def test_analytics_graph_family_matches_operators(spark):
    from rspl_spark.api import analytics
    from rspl_spark.operators.graph import pagerank, triangle_counts

    e = _edges(spark)
    got = {
        (r["node"], round(r["rank"], 9))
        for r in analytics(e).pagerank(n_iter=3).collect()
    }
    want = {
        (r["node"], round(r["rank"], 9)) for r in pagerank(e, n_iter=3).collect()
    }
    assert got == want
    tri = analytics(e).triangle_counts()
    assert {(r["node"], r["n_triangles"]) for r in tri.collect()} == {
        (r["node"], r["n_triangles"]) for r in triangle_counts(e).collect()
    }
    # khop through the facade
    src = spark.createDataFrame([(1,)], "n long")
    d = {
        (r["node"], r["dist"])
        for r in analytics(e).khop_distances(src, 2).collect()
    }
    assert (1, 0) in d and (2, 1) in d


def test_analytics_timeseries_chain(spark):
    """resample through the facade, then chain a plain DataFrame op on
    the wrapped result (delegation ends the fluent chain)."""
    import datetime as dt

    from rspl_spark.api import analytics

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(hours=h), float(h)) for h in (0, 1, 2, 13, 14)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    out = analytics(df).resample(
        keys=["k"], time_col="ts", step="6 HOURS",
        aggs={"v": F.min("v")}, fills={"v": "locf"},
    )
    gaps = out.where(F.col("is_gap")).collect()  # delegated DataFrame op
    assert len(gaps) == 1  # the 06:00 bucket
    assert gaps[0]["v"] == 0.0  # locf carried from the 00:00 bucket


def test_analytics_behavior_and_sketches(spark):
    import datetime as dt

    from rspl_spark.api import analytics

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, t0 + dt.timedelta(days=d), s, i)
            for i, (d, s) in enumerate([(0, "a"), (1, "b"), (2, "a"), (7, "b")])
        ],
        "u long, ts timestamp, s string, eid long",
    )
    tm = analytics(ev).transition_matrix("u", "ts", "s", tiebreak_cols=["eid"])
    assert {(r["prev_state"], r["state"], r["n"]) for r in tm.collect()} == {
        ("a", "b", 2), ("b", "a", 1),
    }
    ret = analytics(ev).cohort_retention("u", "ts", period="week").collect()
    assert ret[0]["offset"] == 0 and ret[0]["n_cohort"] == 1
    rd = analytics(ev).rolling_distinct_hll("u", "ts", window_buckets=3)
    assert rd.count() > 0


def test_analytics_consolidate_records(spark):
    from rspl_spark.api import analytics

    df = spark.createDataFrame(
        [("a", 1, None, 1.0), ("a", 2, "Ann", None)],
        "k string, ts long, name string, score double",
    )
    r = (
        analytics(df)
        .consolidate_records(["k"], [("ts", "desc")],
                             value_cols=["name", "score"])
        .collect()[0]
    )
    assert (r["k"], r["name"], r["score"]) == ("a", "Ann", 1.0)


def test_stream_analytics_twins_mirror_batch(spark):
    """The streaming facade wires the twins: ewma through
    stream_analytics equals ewma through analytics on the same finite
    prefix, and the wrapped result still chains/delegates."""
    import datetime as dt
    import tempfile

    from rspl_spark.api import analytics, stream_analytics
    from rspl_spark.streaming.sources import (
        file_stream,
        run_to_memory_sink,
        write_stream_chunks,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "k string, ts timestamp, v double"
    rows = [("a", t0 + dt.timedelta(hours=h), float(h * h)) for h in range(6)]
    df = spark.createDataFrame(rows, schema)
    chunks = [
        spark.createDataFrame(rows[:3], schema),
        spark.createDataFrame(rows[3:], schema),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        out = stream_analytics(file_stream(spark, tmp, schema)).ewma(
            "k", "ts", "v", window=4
        )
        run_to_memory_sink(out, "t_api_ewma_stream", timeout_s=180)
    got = {
        (r["k"], r["ts"]): r["ewma"]
        for r in spark.table("t_api_ewma_stream").collect()
    }
    want = {
        (r["k"], r["ts"]): round(r["ewma"], 6)
        for r in analytics(df).ewma(["k"], "ts", "v", window=4).collect()
    }
    assert got == want


def test_stream_analytics_sketch_and_funnel(spark):
    """hll/hist are native streaming aggs through the facade (complete
    mode); funnel drains per-user progress rows."""
    import datetime as dt
    import tempfile

    from rspl_spark.api import stream_analytics
    from rspl_spark.streaming.sources import (
        file_stream,
        run_to_memory_sink,
        write_stream_chunks,
    )

    t0 = dt.datetime(2024, 1, 1)
    schema = "u string, ts timestamp, event_type string, v double"
    rows = [
        ("u1", t0, "click", 1.0),
        ("u1", t0 + dt.timedelta(minutes=1), "purchase", 2.0),
        ("u2", t0 + dt.timedelta(minutes=2), "click", 3.0),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(
            spark, tmp, [spark.createDataFrame(rows, schema)]
        )
        bins = stream_analytics(file_stream(spark, tmp, schema)).hist(
            "v", 0.0, 4.0, nbins=4
        )
        run_to_memory_sink(bins, "t_api_hist_stream", timeout_s=180,
                           output_mode="complete")
        fun = stream_analytics(file_stream(spark, tmp, schema)).funnel(
            ["click", "purchase"], user_col="u"
        )
        run_to_memory_sink(fun, "t_api_funnel_stream", timeout_s=180)
    hist = {(r["bin"], r["cnt"]) for r in spark.table("t_api_hist_stream").collect()}
    assert hist == {(1, 1), (2, 1), (3, 1)}  # 1.0, 2.0, 3.0 with width 1
    fun = {r["user"]: r["n_reached"] for r in spark.table("t_api_funnel_stream").collect()}
    assert fun == {"u1": 2, "u2": 1}


def test_stream_analytics_bloom_equals_batch_word_for_word(spark):
    """The drained streaming Bloom filter must equal batch bloom_build
    bit-for-bit (BIT_OR is order-free and idempotent), even when the
    same keys arrive across SEPARATE micro-batches — the exactness
    claim q_bloom_stream's oracle reuse rests on."""
    import tempfile

    from rspl_spark.api import stream_analytics
    from rspl_spark.operators.sketches import bloom_build, bloom_probe
    from rspl_spark.streaming.sources import (
        file_stream,
        run_to_memory_sink,
        write_stream_chunks,
    )

    schema = "key string"
    keys = [(f"k{i:03d}",) for i in range(60)]
    batch = spark.createDataFrame(keys, schema)
    with tempfile.TemporaryDirectory() as tmp:
        # chunk 1 repeats half of chunk 0's keys: the state-store BIT_OR
        # must absorb re-insertion exactly like the batch aggregate
        write_stream_chunks(
            spark,
            tmp,
            [
                spark.createDataFrame(keys[:40], schema),
                spark.createDataFrame(keys[20:], schema),
            ],
        )
        sk = stream_analytics(file_stream(spark, tmp, schema)).bloom(
            "key", m_bits=1 << 10, k=3
        )
        run_to_memory_sink(sk, "t_api_bloom_stream", timeout_s=180,
                           output_mode="complete")
    got = {(r["word"], r["bits"]) for r in spark.table("t_api_bloom_stream").collect()}
    want = {
        (r["word"], r["bits"])
        for r in bloom_build(batch, "key", m_bits=1 << 10, k=3).collect()
    }
    assert got == want
    members = bloom_probe(
        spark.table("t_api_bloom_stream"), batch, "key", m_bits=1 << 10, k=3
    )
    assert members.filter(F.col("member") == 0).count() == 0  # no false negatives


def test_analytics_topk_exact(spark):
    """topk_exact through the facade returns the exact (key, n) top-k
    in (n desc, key asc) order."""
    from rspl_spark.api import analytics

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 3 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = [tuple(r) for r in analytics(df).topk_exact("k", 3).collect()]
    assert got == [("a", 5), ("b", 3), ("c", 3)]
