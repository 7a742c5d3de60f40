"""As-of join (SURVEY.md §2.2 "as-of (nearest earlier event)").

Scalable one-pass formulation: union-free, one shuffle on the key, one
sort on (time, tiebreaker), a conditional running-max window. NOT a
range self-join (O(n²) per key at scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_last(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    mark: Column,
    out_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every row, the greatest ``ts`` at-or-before it among rows
    where ``mark`` is non-null (e.g. ``when(type=='purchase', col('ts'))``).

    One window pass per key: ROWS UNBOUNDED PRECEDING running max of the
    marked timestamp. ``tiebreak_col`` must make the ordering total
    (equal timestamps otherwise make frame membership nondeterministic).
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.max(mark).over(w))


def asof_next(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    mark: Column,
    out_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Forward as-of: for every row, the smallest ``ts`` at-or-after it
    among rows where ``mark`` is non-null (e.g. "time to next
    purchase"). The mirror of :func:`asof_last`: same one-window-pass
    scale shape, frame flipped to CURRENT ROW .. UNBOUNDED FOLLOWING
    with a running min.

    Tie semantics: membership is POSITIONAL under the total
    ``(ts, tiebreak)`` order — a marked row with an EQUAL ``ts`` but a
    smaller ``tiebreak`` sorts before the current row and is therefore
    NOT matched. This differs from pandas ``merge_asof``
    ``direction='forward'``, which matches equal timestamps regardless
    of intra-timestamp row order; the gate oracle replays the same
    ROWS frame, so both engines agree on the positional definition.
    """
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return df.withColumn(out_col, F.min(mark).over(w))


def asof_last_within(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    mark: Column,
    out_col: str,
    tolerance_seconds: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """``asof_last`` with a staleness bound (pandas ``merge_asof``'s
    ``tolerance``): matches older than ``tolerance_seconds`` become null.

    Same single window pass — the bound is a scalar post-condition on the
    running max, so the scale shape is unchanged.
    """
    out = asof_last(df, key_col, ts_col, mark, out_col, tiebreak_col)
    # Compare at MICROSECOND precision (Spark's native timestamp
    # resolution): casting to long floors to whole seconds, which keeps
    # matches whose true gap is in (tol, tol+1) — a silent off-by-up-to-
    # one-second disagreement with exact-epoch implementations.
    fresh = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col(out_col))
    ) <= F.lit(int(tolerance_seconds) * 1_000_000)
    return out.withColumn(out_col, F.when(fresh, F.col(out_col)))
