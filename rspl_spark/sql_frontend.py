"""SQL front-end: DSL terms as table-valued functions, and the analytic
operator families as CALL-style procedures.

**DSL as TVF** — register any StreamProcessor term, callable from plain
``spark.sql``:

    register_stream_processor(spark, "rspl_swap", swap_forever, "bigint")
    spark.sql('''
        SELECT * FROM rspl_swap(TABLE(events)
                                PARTITION BY key ORDER BY seq)
    ''')

Semantics match the keyed interpreter exactly: one fresh term instance
per partition (Spark instantiates the UDTF per partition — with
PARTITION BY that is one per key group), rows arrive in ORDER BY order,
``terminate`` flushes nothing (a Get on exhausted input just stops, the
reference's prefix semantics). This is the "UML-like language compiled
to rspl" future-work item of the reference's closing remarks
(examples/pelican.rs:373-376) realized as SQL.

**Analytics as procedures** — the graph / behavior / time-series /
rolling-sketch operators take whole tables and run multi-stage (often
iterative) plans, which a per-partition UDTF cannot express; the public
precedent for SQL-exposing such operators is the CALL-procedure syntax
(Iceberg's ``CALL catalog.system.rewrite_data_files(...)``). Same shape
here — table arguments are view names, everything else SQL literals:

    events.createOrReplaceTempView("events")
    df = sql_call(spark, \"""
        CALL resample(df => 'events', keys => 'user_id', time_col => 'ts',
                      step => '6 HOURS', aggs => 'v:min(value)',
                      fills => 'v:locf')
    \""")

``sql_call`` parses and dispatches to the SAME operator functions the
Python facade binds (``rspl_spark.api.analytics``) — one semantics,
three surfaces.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from rspl_spark.dsl.core import StreamProcessor, run_prefix


def register_stream_processor(
    spark: SparkSession,
    name: str,
    sp_factory: Callable[[], StreamProcessor],
    out_type: str,
    key_col: str = "key",
    value_col: str = "value",
) -> None:
    """Register ``sp_factory`` as TVF ``name``.

    Output rows: (key, seq, value) with seq = per-partition output
    ordinal. The input table must expose ``key_col`` and ``value_col``;
    call with ``PARTITION BY <key> ORDER BY <seq>`` for keyed streams or
    ``WITH SINGLE PARTITION ORDER BY <seq>`` for one global stream.
    """

    @udtf(returnType=f"`{key_col}` string, seq bigint, `{value_col}` {out_type}")
    class Runner:
        def __init__(self):
            self._sp = sp_factory()
            self._n = 0

        def eval(self, row):
            outs, self._sp = run_prefix(self._sp, [row[value_col]])
            key = str(row[key_col])
            for v in outs:
                yield key, self._n, v
                self._n += 1

    spark.udtf.register(name, Runner)


# --------------------------------------------------------------------------
# CALL-style analytics procedures
# --------------------------------------------------------------------------

def _cols(v: str) -> list[str]:
    """'a,b,c' → ['a', 'b', 'c'] — splitting on TOP-LEVEL commas only,
    so an aggregate expression containing a comma
    (``aggs => 'c:corr(a,b)'``) stays one item. Parens and commas
    inside SQL string literals are literal text — ``'),('`` inside a
    ``string_agg`` separator must neither unbalance the depth count
    nor split the item (a doubled quote inside a literal toggles the
    state twice, which nets out correctly). Unbalanced parentheses or
    an unterminated quote fail loudly (a silently misparsed aggregate
    is worse than none)."""
    s = str(v)
    items: list[str] = []
    buf: list[str] = []
    depth = 0
    quote: str | None = None  # the open string-literal delimiter, if any
    for ch in s:
        if quote is not None:
            if ch == quote:
                quote = None
            buf.append(ch)
            continue
        if ch in ("'", '"'):
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in list literal {s!r}")
        if ch == "," and depth == 0:
            items.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if quote is not None:
        raise ValueError(f"unterminated {quote} string in list literal {s!r}")
    if depth != 0:
        raise ValueError(f"unbalanced '(' in list literal {s!r}")
    items.append("".join(buf))
    return [c.strip() for c in items if c.strip()]


def _colmap(v: str) -> dict[str, str]:
    """'v:locf,n:zero' → {'v': 'locf', 'n': 'zero'}. Values may contain
    commas inside parentheses ('c:corr(a,b)')."""
    out: dict[str, str] = {}
    for item in _cols(v):
        k, _, m = item.partition(":")
        if not _ or not k or not m:
            raise ValueError(f"expected 'col:value' pairs, got {item!r}")
        out[k.strip()] = m.strip()
    return out


def _aggmap(v: str) -> dict:
    """'v:min(value),n:count(*)' → {'v': F.expr('min(value)'), …}."""
    return {k: F.expr(expr) for k, expr in _colmap(v).items()}


def _proc_pagerank(spark, df, n_iter=10, damping=0.85, src_col="src",
                   dst_col="dst", tol=None, reset=None, weight_col=None):
    from rspl_spark.operators.graph import pagerank

    return pagerank(
        df, n_iter=int(n_iter), damping=float(damping), src_col=src_col,
        dst_col=dst_col, tol=float(tol) if tol is not None else None,
        reset_df=spark.table(reset) if reset else None,
        weight_col=weight_col,
    )


def _proc_khop(spark, df, sources, max_hops, src_col="src", dst_col="dst",
               node_col="node"):
    from rspl_spark.operators.graph import khop_distances

    return khop_distances(df, spark.table(sources), int(max_hops),
                          src_col=src_col, dst_col=dst_col, node_col=node_col)


def _proc_triangles(spark, df, src_col="src", dst_col="dst"):
    from rspl_spark.operators.graph import triangle_counts

    return triangle_counts(df, src_col=src_col, dst_col=dst_col)


def _proc_cohort_retention(spark, df, user_col, ts_col, period="week"):
    from rspl_spark.operators.behavior import cohort_retention

    return cohort_retention(df, user_col, ts_col, period=period)


def _proc_transition_matrix(spark, df, key_col, ts_col, state_col,
                            tiebreak_cols=None):
    from rspl_spark.operators.behavior import transition_matrix

    return transition_matrix(
        df, key_col, ts_col, state_col,
        tiebreak_cols=_cols(tiebreak_cols) if tiebreak_cols else None,
    )


def _proc_pmi(spark, df, text_col="text", min_count=5, top_k=50):
    from rspl_spark.operators.text import pmi_collocations

    return pmi_collocations(df, text_col=text_col, min_count=int(min_count),
                            top_k=int(top_k))


def _proc_gapfill(spark, df, keys, time_col, step, fills, mark_gaps=True,
                  max_gap_buckets=100_000):
    from rspl_spark.operators.timeseries import gapfill

    return gapfill(df, _cols(keys), time_col, step, _colmap(fills),
                   mark_gaps=bool(mark_gaps),
                   max_gap_buckets=int(max_gap_buckets)
                   if max_gap_buckets is not None else None)


def _proc_resample(spark, df, keys, time_col, step, aggs, fills,
                   mark_gaps=True, max_gap_buckets=100_000):
    from rspl_spark.operators.timeseries import resample

    return resample(df, _cols(keys), time_col, step, _aggmap(aggs),
                    _colmap(fills), mark_gaps=bool(mark_gaps),
                    max_gap_buckets=int(max_gap_buckets)
                    if max_gap_buckets is not None else None)


def _proc_ewma(spark, df, keys, time_col, value_col, window=16,
               out_col="ewma"):
    from rspl_spark.operators.timeseries import ewma

    return ewma(df, _cols(keys), time_col, value_col, window=int(window),
                out_col=out_col)


def _proc_rolling_median(spark, df, keys, time_col, value_col, n_buckets=7,
                         out_col="rmedian"):
    from rspl_spark.operators.timeseries import rolling_median

    return rolling_median(df, _cols(keys), time_col, value_col,
                          n_buckets=int(n_buckets), out_col=out_col)


def _proc_mad_outliers(spark, df, group_cols, value_col, k=3.0):
    from rspl_spark.operators.timeseries import mad_outliers

    return mad_outliers(df, _cols(group_cols), value_col, k=float(k))


def _proc_rolling_distinct(spark, df, key_col, ts_col, step="1 day",
                           window_buckets=7):
    from rspl_spark.operators.sketches import rolling_distinct_hll

    return rolling_distinct_hll(df, key_col, ts_col, step=step,
                                window_buckets=int(window_buckets))


def _proc_rolling_quantiles(spark, df, value_col, ts_col, step="1 day",
                            window_buckets=7, qs="0.5,0.95", nbins=256):
    from rspl_spark.operators.sketches import rolling_hist_quantiles

    return rolling_hist_quantiles(
        df, value_col, ts_col, step=step, window_buckets=int(window_buckets),
        qs=tuple(float(q) for q in _cols(str(qs))), nbins=int(nbins),
    )


def _proc_group_split(spark, df, group_col, weights=None, out_col="split"):
    from rspl_spark.operators.curation import group_split

    w = None
    if weights:
        w = {k: int(v) for k, v in _colmap(weights).items()}
    return group_split(df, group_col, weights=w, out_col=out_col)


def _proc_cdf_match(spark, df, group_cols, value_col, n_grid=1000,
                    out_col="calibrated", reference=None,
                    rank_col="pct_rank"):
    from rspl_spark.operators.curation import cdf_match

    return cdf_match(
        df, _cols(group_cols), value_col, n_grid=int(n_grid),
        out_col=out_col,
        reference_df=spark.table(reference) if reference else None,
        rank_col=rank_col,
    )


def _proc_consolidate(spark, df, key_cols, priority, value_cols=None,
                      completeness_first=False):
    from rspl_spark.operators.curation import consolidate_records

    return consolidate_records(
        df, _cols(key_cols), list(_colmap(priority).items()),
        value_cols=_cols(value_cols) if value_cols else None,
        completeness_first=bool(completeness_first),
    )


def _proc_topk_exact(spark, df, key_col, k, w=1 << 16):
    from rspl_spark.operators.sketches import cms_topk_exact

    return cms_topk_exact(df, key_col, int(k), w=int(w))


#: procedure name → fn(spark, df, **kwargs). ``df`` is the resolved
#: table argument (every procedure's first parameter, passed as
#: ``df => '<view name>'``); other table args stay view-name strings
#: and are resolved inside the adapter (khop's ``sources``).
PROCEDURES: dict[str, Callable] = {
    "pagerank": _proc_pagerank,
    "khop_distances": _proc_khop,
    "triangle_counts": _proc_triangles,
    "cohort_retention": _proc_cohort_retention,
    "transition_matrix": _proc_transition_matrix,
    "pmi_collocations": _proc_pmi,
    "gapfill": _proc_gapfill,
    "resample": _proc_resample,
    "ewma": _proc_ewma,
    "rolling_median": _proc_rolling_median,
    "mad_outliers": _proc_mad_outliers,
    "cdf_match": _proc_cdf_match,
    "group_split": _proc_group_split,
    "consolidate_records": _proc_consolidate,
    "rolling_distinct_hll": _proc_rolling_distinct,
    "rolling_hist_quantiles": _proc_rolling_quantiles,
    "topk_exact": _proc_topk_exact,
}


def call_procedure(spark: SparkSession, name: str, df, **kwargs) -> DataFrame:
    """Dispatch an analytics procedure by name. ``df`` is a DataFrame
    or a view name; see :data:`PROCEDURES` for the catalog. Unknown
    argument names raise (a typo'd ``dampin =>`` must not silently run
    with the default)."""
    import inspect

    if name not in PROCEDURES:
        raise ValueError(
            f"unknown procedure {name!r}; available: {sorted(PROCEDURES)}"
        )
    proc = PROCEDURES[name]
    params = set(inspect.signature(proc).parameters) - {"spark", "df"}
    unknown = set(kwargs) - params
    if unknown:
        raise ValueError(
            f"procedure {name!r} got unknown argument(s) "
            f"{sorted(unknown)}; accepts: {sorted(params)}"
        )
    if isinstance(df, str):
        df = spark.table(df)
    return proc(spark, df, **kwargs)


_CALL_RE = re.compile(r"^\s*CALL\s+(\w+)\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL)
_ARG_RE = re.compile(
    r"\s*(\w+)\s*=>\s*('(?:[^']|'')*'|[^,]+)\s*(?:,|$)", re.DOTALL
)


def _parse_literal(tok: str):
    tok = tok.strip()
    if tok.startswith("'") and tok.endswith("'"):
        return tok[1:-1].replace("''", "'")
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        raise ValueError(f"cannot parse CALL argument literal {tok!r}")


def sql_call(spark: SparkSession, statement: str) -> DataFrame:
    """Execute ``CALL name(arg => literal, …)`` (module doc) and return
    the result DataFrame. String literals use SQL quoting ('' escapes a
    quote); the ``df`` argument names the input view."""
    m = _CALL_RE.match(statement)
    if not m:
        raise ValueError("expected: CALL name(arg => value, …)")
    name, body = m.group(1), m.group(2)
    kwargs = {}
    pos = 0
    while pos < len(body.rstrip()):
        am = _ARG_RE.match(body, pos)
        if not am:
            raise ValueError(f"cannot parse CALL arguments at: {body[pos:]!r}")
        kwargs[am.group(1)] = _parse_literal(am.group(2))
        pos = am.end()
    if "df" not in kwargs:
        raise ValueError("CALL requires a df => '<view name>' argument")
    return call_procedure(spark, name.lower(), kwargs.pop("df"), **kwargs)
