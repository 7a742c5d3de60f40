"""Behavioral analytics tests (operators/behavior.py): multi-cohort
retention on hand-built activity (the events-table gate only has one
cohort — synthetic data covers the rest), and transition matrices with
deterministic tie-breaking.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from rspl_spark.operators.behavior import cohort_retention, transition_matrix

# Mondays — date_trunc('week') boundaries
W0 = dt.datetime(2024, 1, 1, 12, 0)
W1 = W0 + dt.timedelta(weeks=1)
W2 = W0 + dt.timedelta(weeks=2)


def _events(spark, rows):
    """rows: (user, ts[, event_type, event_id])"""
    return spark.createDataFrame(
        [
            Row(
                user_id=r[0],
                ts=r[1],
                event_type=r[2] if len(r) > 2 else "view",
                event_id=r[3] if len(r) > 3 else i,
            )
            for i, r in enumerate(rows)
        ]
    )


def test_cohort_retention_two_cohorts(spark):
    # cohort W0: users 1,2 — user 1 returns in W1 and W2, user 2 never
    # cohort W1: user 3 — returns in W2
    df = _events(
        spark,
        [
            (1, W0), (2, W0),
            (1, W1), (3, W1),
            (1, W2), (3, W2),
            (1, W0 + dt.timedelta(days=2)),  # same week: no double count
        ],
    )
    got = {
        (str(r["cohort"]), r["offset"]): (r["n_active"], r["n_cohort"], r["retention"])
        for r in cohort_retention(df, "user_id", "ts", "week").collect()
    }
    c0, c1 = str(W0.date()), str(W1.date())
    assert got == {
        (c0, 0): (2, 2, 1.0),
        (c0, 1): (1, 2, 0.5),
        (c0, 2): (1, 2, 0.5),
        (c1, 0): (1, 1, 1.0),
        (c1, 1): (1, 1, 1.0),
    }


def test_cohort_retention_daily_period_and_validation(spark):
    df = _events(spark, [(1, W0), (1, W0 + dt.timedelta(days=3))])
    got = {
        r["offset"]: r["n_active"]
        for r in cohort_retention(df, "user_id", "ts", "day").collect()
    }
    assert got == {0: 1, 3: 1}
    with pytest.raises(ValueError, match="period"):
        cohort_retention(df, "user_id", "ts", "month")


def test_transition_matrix_counts_and_rows_normalize(spark):
    h = dt.timedelta(hours=1)
    df = _events(
        spark,
        [
            # user 1: a -> b -> a -> b   (a->b twice, b->a once)
            (1, W0, "a", 10), (1, W0 + h, "b", 11),
            (1, W0 + 2 * h, "a", 12), (1, W0 + 3 * h, "b", 13),
            # user 2: a -> c             (a->c once)
            (2, W0, "a", 20), (2, W0 + h, "c", 21),
        ],
    )
    got = {
        (r["prev_state"], r["state"]): (r["n"], r["p"])
        for r in transition_matrix(
            df, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
        ).collect()
    }
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_transition_matrix_tiebreak_is_deterministic(spark):
    """Two events at the SAME timestamp: the unique id orders them, so
    repeated runs give the identical pair multiset."""
    df = _events(
        spark,
        [(1, W0, "x", 1), (1, W0, "y", 2), (1, W0 + dt.timedelta(hours=1), "z", 3)],
    )
    expect = {("x", "y"), ("y", "z")}
    for _ in range(3):
        got = {
            (r["prev_state"], r["state"])
            for r in transition_matrix(
                df, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
            ).collect()
        }
        assert got == expect


def test_transition_matrix_single_event_keys_contribute_nothing(spark):
    df = _events(spark, [(1, W0, "a", 1), (2, W0, "b", 2)])
    assert (
        transition_matrix(
            df, "user_id", "ts", "event_type", tiebreak_cols=["event_id"]
        ).count()
        == 0
    )


def test_pmi_collocations_hand_computed(spark):
    """PMI on an enumerable corpus: pmi = ln(n_ab·N / (n_a·n_b))."""
    import math

    from rspl_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [("san francisco",), ("san francisco",), ("new york",), ("new san",)],
        "text string",
    )
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["pmi"])
        for r in pmi_collocations(docs, "text", min_count=1, top_k=10).collect()
    }
    ln2 = round(math.log(2.0), 6)
    # N=4 pairs; san appears twice as first, new twice as first
    assert got == {
        ("san", "francisco"): (2, ln2),  # ln(2*4 / (2*2))
        ("new", "york"): (1, ln2),       # ln(1*4 / (2*1))
        ("new", "san"): (1, ln2),        # ln(1*4 / (2*1))
    }
    # min_count prunes hapax pairs
    assert (
        pmi_collocations(docs, "text", min_count=2, top_k=10).count() == 1
    )


# ---------------------------------------------------------------- plan pins


def _final_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


def test_behavior_gates_scan_corpus_once(spark):
    from rspl_spark.queries import load_registry

    reg = load_registry()
    for gate in ("q_cohort_retention", "q_transition_matrix", "q_pmi_collocations"):
        plan = _final_plan(reg[gate].fn(spark, "/root/testdata/sf0.001"))
        n = max(plan.count("Scan parquet"), plan.count("FileScan"))
        assert n == 1, f"{gate}: {n} scans"


def test_rolling_distinct_hll_tracks_exact_within_error(spark):
    """The merged-register rolling estimate stays within HLL error
    (~4.6% at m=512; allow 3σ) of the exact rolling distinct, and
    windows slide: early users age out after window_buckets days."""
    import datetime as dt

    from rspl_spark.operators.sketches import rolling_distinct_hll

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # day d has users [100*d, 100*d + 60): 60/day, disjoint across days
    for d in range(6):
        for u in range(60):
            rows.append(Row(user_id=100 * d + u, ts=t0 + dt.timedelta(days=d, hours=1)))
    df = spark.createDataFrame(rows)
    out = {
        str(r["bts"].date()): r["approx_distinct"]
        for r in rolling_distinct_hll(
            df, "user_id", "ts", step="1 day", window_buckets=3
        ).collect()
    }
    assert len(out) == 6
    for d in range(6):
        exact = 60 * min(d + 1, 3)  # trailing 3 disjoint days
        got = out[str((t0 + dt.timedelta(days=d)).date())]
        assert abs(got - exact) / exact < 0.15, (d, got, exact)
    import pytest as _pt

    with _pt.raises(ValueError, match="window_buckets"):
        rolling_distinct_hll(df, "user_id", "ts", window_buckets=0)


def test_rolling_distinct_hll_plan_no_rescan(spark):
    """The bounds branch must NOT re-execute the corpus scan: registers
    are checkpointed, so the final plan is rooted at the materialized
    register RDD with zero parquet scans (the one real scan happens
    once, inside the checkpoint job)."""
    from rspl_spark.queries import load_registry

    reg = load_registry()
    df = reg["q_rolling_distinct_hll"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 0


def test_rolling_quantiles_hist_tracks_exact_within_binwidth(spark):
    """Merged-histogram rolling p50/p95 within one global bin width of
    the exact sliding percentile; windows demonstrably slide (day 3's
    window drops day 0's distribution)."""
    import datetime as dt

    import numpy as np

    from rspl_spark.operators.sketches import rolling_hist_quantiles

    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.RandomState(7)
    rows, per_day = [], 400
    day_vals = {}
    for d in range(5):
        vals = np.round(rng.uniform(0, 100, per_day) + 50 * d, 3)  # shifting dist
        day_vals[d] = vals
        rows += [
            Row(value=float(v), ts=t0 + dt.timedelta(days=d, minutes=int(i)))
            for i, v in enumerate(vals)
        ]
    df = spark.createDataFrame(rows)
    nbins = 128
    out = {
        (str(r["bts"].date()), r["q"]): r["est"]
        for r in rolling_hist_quantiles(
            df, "value", "ts", step="1 day", window_buckets=2, qs=(0.5, 0.95),
            nbins=nbins,
        ).collect()
    }
    lo = min(v.min() for v in day_vals.values())
    hi = max(v.max() for v in day_vals.values())
    binw = (hi - lo) / nbins
    for d in range(5):
        window = np.concatenate(
            [day_vals[x] for x in range(max(0, d - 1), d + 1)]
        )
        for q in (0.5, 0.95):
            exact = float(np.quantile(window, q))
            got = out[(str((t0 + dt.timedelta(days=d)).date()), q)]
            assert abs(got - exact) <= binw + 1e-9, (d, q, got, exact, binw)
    import pytest as _pt

    with _pt.raises(ValueError, match="nbins"):
        rolling_hist_quantiles(df, "value", "ts", nbins=1)
    with _pt.raises(ValueError, match="quantiles"):
        rolling_hist_quantiles(df, "value", "ts", qs=(1.5,))


def test_rolling_quantiles_hist_plan_no_rescan(spark):
    """Bin grain is checkpointed before the bounds branch — the final
    plan reads the materialized bins, zero extra parquet scans."""
    from rspl_spark.queries import load_registry

    reg = load_registry()
    df = reg["q_rolling_quantiles_hist"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert max(plan.count("Scan parquet"), plan.count("FileScan")) == 0


def test_transition_matrix_drops_null_states_consistently(spark):
    """Review fix: NULL states are not states — [A, NULL, B] yields the
    A->B transition (neighbors become adjacent), never an asymmetric
    matrix where A->NULL is kept but NULL->B vanishes."""
    import datetime as dt

    from rspl_spark.operators.behavior import transition_matrix

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            ("u", t0, "A"),
            ("u", t0 + dt.timedelta(minutes=1), None),
            ("u", t0 + dt.timedelta(minutes=2), "B"),
        ],
        "user_id string, ts timestamp, event_type string",
    )
    got = {
        (r["prev_state"], r["state"]): r["n"]
        for r in transition_matrix(df, "user_id", "ts", "event_type").collect()
    }
    assert got == {("A", "B"): 1}
