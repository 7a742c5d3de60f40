"""DSL terms callable from plain SQL via table-valued functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from rspl_spark.dsl import compose, eval_sp, filter_sp, map_sp
from rspl_spark.dsl.core import Get, Put
from rspl_spark.sql_frontend import register_stream_processor


def test_sql_tvf_keyed_fsm(spark):
    """PARTITION BY key ORDER BY seq: one fresh Mealy instance per key,
    results identical to the pure evaluator per key."""
    sp_factory = lambda: compose(filter_sp(lambda v: v % 2 == 0), map_sp(lambda v: v * 7))
    register_stream_processor(spark, "rspl_evens7", sp_factory, "bigint")
    bases = {"a": 0, "b": 10}
    rows = [(k, i, bases[k] + i) for k in ("a", "b") for i in range(6)]
    spark.createDataFrame(rows, "key string, seq long, value long").createOrReplaceTempView(
        "sql_fsm_in"
    )
    out = spark.sql(
        "SELECT * FROM rspl_evens7(TABLE(sql_fsm_in) PARTITION BY key ORDER BY seq)"
    )
    got = {
        k: [r["value"] for r in out.filter(F.col("key") == k).orderBy("seq").collect()]
        for k in ("a", "b")
    }
    for k, base in (("a", 0), ("b", 10)):
        want = list(eval_sp(sp_factory(), [base + i for i in range(6)]))
        assert got[k] == want


def test_sql_tvf_single_partition_swap(spark):
    """WITH SINGLE PARTITION: one global totally ordered stream."""

    def swap():
        return Get(lambda a: Get(lambda b: Put(b, lambda: Put(a, swap))))

    register_stream_processor(spark, "rspl_swap", swap, "bigint")
    spark.createDataFrame(
        [("s", i, i + 1) for i in range(5)], "key string, seq long, value long"
    ).createOrReplaceTempView("sql_swap_in")
    out = spark.sql(
        "SELECT * FROM rspl_swap(TABLE(sql_swap_in) WITH SINGLE PARTITION ORDER BY seq)"
    )
    assert [r["value"] for r in out.orderBy("seq").collect()] == [2, 1, 4, 3]


def test_sql_tvf_composes_with_sql(spark):
    """The TVF result is a normal relation — joinable/aggregatable in the
    same SQL statement."""
    register_stream_processor(
        spark, "rspl_pos", lambda: filter_sp(lambda v: v > 0), "bigint"
    )
    spark.createDataFrame(
        [("x", i, v) for i, v in enumerate([3, -1, 5, -2, 7])],
        "key string, seq long, value long",
    ).createOrReplaceTempView("sql_pos_in")
    row = spark.sql(
        """
        SELECT COUNT(*) AS n, SUM(value) AS s
        FROM rspl_pos(TABLE(sql_pos_in) PARTITION BY key ORDER BY seq)
        """
    ).collect()[0]
    assert (row["n"], row["s"]) == (3, 15)


# ---------------------------------------------------------------- procedures
# r11: the analytic families as CALL-style SQL procedures (the Iceberg
# CALL precedent) — same operator functions as the Python facade.


def test_sql_call_resample_roundtrip(spark):
    import datetime as dt

    from rspl_spark.sql_frontend import sql_call

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=h), float(h)) for h in (0, 1, 13)]
    spark.createDataFrame(
        rows, "k long, ts timestamp, v double"
    ).createOrReplaceTempView("sqlcall_events")
    out = sql_call(spark, """
        CALL resample(df => 'sqlcall_events', keys => 'k', time_col => 'ts',
                      step => '6 HOURS', aggs => 'v:min(v)', fills => 'v:locf')
    """)
    got = [(str(r["ts"])[11:13], r["v"], r["is_gap"]) for r in out.orderBy("ts").collect()]
    assert got == [("00", 0.0, False), ("06", 0.0, True), ("12", 13.0, False)]


def test_sql_call_pagerank_matches_operator(spark):
    from rspl_spark.operators.graph import pagerank
    from rspl_spark.sql_frontend import sql_call

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    e.createOrReplaceTempView("sqlcall_edges")
    got = sql_call(
        spark, "CALL pagerank(df => 'sqlcall_edges', n_iter => 3)"
    )
    want = pagerank(e, n_iter=3)
    assert {(r["node"], round(r["rank"], 9)) for r in got.collect()} == {
        (r["node"], round(r["rank"], 9)) for r in want.collect()
    }


def test_sql_call_parse_errors(spark):
    import pytest

    from rspl_spark.sql_frontend import sql_call

    with pytest.raises(ValueError, match="unknown procedure"):
        sql_call(spark, "CALL nonsense(df => 'x')")
    with pytest.raises(ValueError, match="df =>"):
        sql_call(spark, "CALL pagerank(n_iter => 3)")
    with pytest.raises(ValueError, match="expected: CALL"):
        sql_call(spark, "SELECT 1")


def test_sql_call_string_escapes_and_kwargs(spark):
    import datetime as dt

    from rspl_spark.sql_frontend import sql_call

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(days=d), float(v))
        for d, v in [(0, 1.0), (1, 2.0), (2, 30.0), (3, 4.0)]
    ]
    spark.createDataFrame(
        rows, "k long, ts timestamp, v double"
    ).createOrReplaceTempView("sqlcall_mad")
    out = sql_call(spark, """
        CALL rolling_median(df => 'sqlcall_mad', keys => 'k',
                            time_col => 'ts', value_col => 'v',
                            n_buckets => 3, out_col => 'rm')
    """)
    meds = [r["rm"] for r in out.orderBy("ts").collect()]
    assert meds == [1.0, 1.5, 2.0, 4.0]


def test_sql_call_consolidate_records(spark):
    from rspl_spark.sql_frontend import sql_call

    spark.createDataFrame(
        [("a", 1, None, 1.0), ("a", 2, "Ann", None)],
        "k string, ts long, name string, score double",
    ).createOrReplaceTempView("sqlcall_recs")
    out = sql_call(spark, """
        CALL consolidate_records(df => 'sqlcall_recs', key_cols => 'k',
                                 priority => 'ts:desc',
                                 value_cols => 'name,score')
    """)
    r = out.collect()[0]
    assert (r["k"], r["name"], r["score"]) == ("a", "Ann", 1.0)


def test_sql_call_rejects_unknown_arguments(spark):
    """r11 self-review fix: a typo'd argument must raise, not silently
    run with the default."""
    import pytest

    from rspl_spark.sql_frontend import sql_call

    spark.createDataFrame([(1, 2)], "src long, dst long").createOrReplaceTempView(
        "sqlcall_unknown"
    )
    with pytest.raises(ValueError, match="unknown argument"):
        sql_call(spark, "CALL pagerank(df => 'sqlcall_unknown', dampin => 0.5)")


def test_sql_call_group_split(spark):
    from rspl_spark.sql_frontend import sql_call

    spark.range(100).select(F.col("id").alias("u")).createOrReplaceTempView(
        "sqlcall_gs"
    )
    out = sql_call(spark, "CALL group_split(df => 'sqlcall_gs', group_col => 'u', weights => 'a:50,b:50')")
    assert {r["split"] for r in out.select("split").distinct().collect()} == {"a", "b"}

def test_sql_call_comma_inside_aggregate_parses(spark):
    """Top-level-comma splitting: an aggregate containing a comma
    ('c:covar_samp(v,v)') is ONE aggs item; unbalanced parens still
    fail loudly."""
    import datetime as dt

    import pytest

    from rspl_spark.sql_frontend import _colmap, _cols, sql_call

    assert _cols("a,corr(x,y),b") == ["a", "corr(x,y)", "b"]
    assert _colmap("c:corr(a,b),m:min(v)") == {"c": "corr(a,b)", "m": "min(v)"}
    with pytest.raises(ValueError, match="unbalanced"):
        _cols("corr(a,b")
    with pytest.raises(ValueError, match="unbalanced"):
        _cols("corr a,b)")
    # parens/commas INSIDE string literals are literal text, not syntax
    assert _cols("s:string_agg(v, '),(')") == ["s:string_agg(v, '),(')"]
    assert _cols("c:count_if(contains(s, '('))") == [
        "c:count_if(contains(s, '('))"
    ]
    assert _cols('''a,concat(x, "y,z"),b''') == ["a", 'concat(x, "y,z")', "b"]
    assert _cols("s:rtrim(v, 'it''s')") == ["s:rtrim(v, 'it''s')"]  # '' escape
    with pytest.raises(ValueError, match="unterminated"):
        _cols("s:substr(v, 'oops)")

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(hours=h), float(h)) for h in (0, 1, 2)]
    spark.createDataFrame(
        rows, "k long, ts timestamp, v double"
    ).createOrReplaceTempView("sqlcall_corr")
    out = sql_call(spark, """
        CALL resample(df => 'sqlcall_corr', keys => 'k', time_col => 'ts',
                      step => '12 HOURS', aggs => 'c:covar_samp(v,v)',
                      fills => 'c:null')
    """)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["c"] == 1.0  # var of (0,1,2)


def test_sql_call_pagerank_coerces_tol_string(spark):
    """A quoted tol literal reaches pagerank as float, not str."""
    from rspl_spark.sql_frontend import sql_call

    spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long"
    ).createOrReplaceTempView("sqlcall_tol_edges")
    out = sql_call(spark, """
        CALL pagerank(df => 'sqlcall_tol_edges', n_iter => 5, tol => '0.5')
    """)
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert set(ranks) == {1, 2}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_sql_call_topk_exact(spark):
    """CALL topk_exact resolves the view and coerces k/w."""
    from rspl_spark.sql_frontend import sql_call

    rows = [("x",)] * 4 + [("y",)] * 2 + [("z",)] * 1
    spark.createDataFrame(rows, "term string").createOrReplaceTempView(
        "sqlcall_topk"
    )
    out = sql_call(
        spark, "CALL topk_exact(df => 'sqlcall_topk', key_col => 'term', k => '2')"
    )
    assert [tuple(r) for r in out.collect()] == [("x", 4), ("y", 2)]
