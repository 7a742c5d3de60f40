"""Behavioral / product analytics over event streams: cohort
retention and Markov transition matrices.

The reference's FSM combinators (tests/events.rs
states-as-continuations) model ONE entity's behavior over time; these
operators aggregate behavior ACROSS entities — the two standard
population views a product team asks for once per-entity machinery
exists: "do users come back?" (retention) and "where do they go next?"
(transitions).

Scale shape: both operators collapse the raw corpus to a small grain
in their FIRST aggregation (distinct user-periods; state bigram
counts) with map-side partial aggregation, then run everything else at
that grain. No windows over raw events except transition_matrix's
per-key lag — whose partition is one key's events, the same
partitioning every keyed op in this engine shuffles on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PERIOD_DAYS = {"day": 1, "week": 7}


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """(cohort, offset, n_active, n_cohort, retention) — users bucketed
    by FIRST-activity period; ``n_active`` counts the cohort's users
    active exactly ``offset`` periods later; ``retention`` =
    n_active / n_cohort rounded to 6dp.

    ``period``: ``"week"`` (date_trunc to Monday) or ``"day"`` — both
    give EXACT integer offsets (datediff / period length); calendar
    months don't and are deliberately unsupported. Every cohort has an
    offset-0 row (its members are active in their first period by
    construction), so n_cohort is derived in-frame — one scan, two
    shuffles (user-period dedup, cohort-offset count), all integer
    until the final ratio.
    """
    if period not in _PERIOD_DAYS:
        raise ValueError(f"cohort_retention: period must be one of {sorted(_PERIOD_DAYS)}")
    plen = _PERIOD_DAYS[period]
    up = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("p"),
    ).distinct()
    wu = Window.partitionBy("u")
    upc = up.withColumn("cohort", F.min("p").over(wu)).withColumn(
        "offset", (F.datediff(F.col("p"), F.col("cohort")) / plen).cast("long")
    )
    counts = upc.groupBy("cohort", "offset").agg(
        F.count(F.lit(1)).cast("long").alias("n_active")
    )
    wc = Window.partitionBy("cohort")
    return (
        counts.withColumn(
            "n_cohort",
            F.max(F.when(F.col("offset") == 0, F.col("n_active"))).over(wc),
        )
        .withColumn(
            "retention",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"),
                6,
            ),
        )
        .select("cohort", "offset", "n_active", "n_cohort", "retention")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """(prev_state, state, n, p) — first-order Markov transition counts
    over each key's time-ordered state sequence, with ``p`` the
    row-normalized probability (n / Σ n over prev_state, 6dp).

    Each key's first event has no predecessor and contributes no pair.
    Ordering must be DETERMINISTIC for a reproducible matrix: pass
    ``tiebreak_cols`` (e.g. a unique event id) when ``ts_col`` can tie
    within a key — ties broken arbitrarily would make the pair multiset
    run-dependent.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    # NULL states are NOT states: dropped up front so their neighbors
    # become adjacent ([A, NULL, B] contributes A->B). Unfiltered, the
    # lag-NULL first-event marker conflates with a NULL state —
    # transitions OUT of NULL vanished while transitions INTO it were
    # kept, leaking p-mass into a NULL pseudo-state
    pairs = (
        df.filter(F.col(state_col).isNotNull())
        .withColumn("prev_state", F.lag(F.col(state_col)).over(w))
        .where(F.col("prev_state").isNotNull())
        .select("prev_state", F.col(state_col).alias("state"))
    )
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wp = Window.partitionBy("prev_state")
    return counts.withColumn(
        "p",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wp).cast("double"), 6
        ),
    )
