"""Regular-grid time-series operators: gap-fill (LOCF / linear
interpolation), exact-replay EWMA smoothing, rolling median, and
MAD-based outlier flags.

The reference engine's stream combinators (map/filter/windows over a
paced source — src/combinators.rs, the hics demand-driven meter) assume
a DENSE tick stream; real telemetry lands sparse. These operators
reconstruct the dense grid Spark-side so every downstream windowed
consumer (streaming or batch) sees one row per (key, bucket):

- ``gapfill``: each observation emits its own grid SEGMENT — the
  buckets from itself up to (exclusive) the next observation, via one
  ``lead`` window + a map-side ``sequence``/``explode``. No spine
  aggregate, no spine join, no ignorenulls window chains: the segment
  row already carries both bracketing observations, so LOCF is the
  segment's own value and linear interpolation is a local lerp. ONE
  pass over the bucket-grain input, ONE shuffle (the keys hash
  partition for the lead window). The union of segments spans exactly
  [first, last] observation per key, so every gap is interior:
  interpolation never extrapolates.
- ``ewma``: exponentially weighted moving average over the trailing
  ``window`` buckets with decay 1/2 per bucket. Weights are EXACT
  powers of two built from integer shifts (never libm ``pow``, whose
  last-ulp behavior differs across engines), the weighted sum is a
  sequential left fold (``F.aggregate``), and the single division
  happens once at the end — the full arithmetic replays bit-identically
  in any engine that folds lists sequentially (DuckDB LIST_SUM).
- ``rolling_median``: exact windowed median (Spark ``percentile`` over
  a ROWS frame ≡ DuckDB ``QUANTILE_CONT`` — both linear-interpolating).
- ``mad_outliers``: median / median-absolute-deviation fences as two
  chained unbounded window percentiles over one group partitioning
  (ONE FileScan, ONE exchange — never agg+join branches, which Spark
  re-executes per branch) — the robust alternative to z-scores whose
  mean/stddev a single 100 TB-scale outlier drags.

Scale shape: the expensive input (raw events) is aggregated to the
bucket grain FIRST — every window/join here runs on the bucket-grain
frame (keys x buckets rows), never the raw corpus. The spine join
shuffles on (keys, bucket); the fill windows re-use one hash partition
on keys with two sorts (forward + reverse). Grid width is bounded by
the observed span / step, so a runaway key cannot explode the spine
beyond span/step rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bt(name: str) -> str:
    """Backtick-quote an identifier for use inside ``F.expr`` — column
    names with spaces/dots/backticks must not be pasted raw into SQL
    text (both a breakage and an injection vector)."""
    return "`" + name.replace("`", "``") + "`"


def step_micros(step: str):
    """SQL interval body → its length in microseconds, as an exact
    integer Column (epoch + interval — no float parsing). Shared by
    every bucket-index computation (gapfill's guard, the rolling
    sketch windows) so the bucketing arithmetic cannot drift apart."""
    return F.unix_micros(
        F.timestamp_seconds(F.lit(0)) + F.expr(f"INTERVAL {step}")
    )


def gapfill(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    step: str,
    fills: dict[str, str],
    mark_gaps: bool = True,
    max_gap_buckets: int | None = 100_000,
) -> DataFrame:
    """Fill missing buckets of an already-bucketed frame.

    ``df`` must hold at most one row per (keys, time_col) at bucket
    grain (bucket first: ``groupBy(window(ts, step))`` or
    ``F.date_trunc``). ``step`` is a SQL interval body, e.g.
    ``"6 HOURS"``. ``fills`` maps value column → ``"locf"`` |
    ``"linear"`` | ``"zero"`` | ``"null"``.

    LOCF carries the previous observation; the first bucket per key is
    always observed (the spine starts there), so LOCF never yields a
    leading NULL. Linear interpolation uses the bracketing non-null
    observations, weighting by microsecond distance, rounded to 6dp on
    FILLED rows only (observed values pass through untouched).
    ``mark_gaps`` adds a BOOLEAN ``is_gap`` column.

    NULL contract: a row with a NULL value in a fill column is still an
    OBSERVATION — LOCF carries the NULL across its segment and linear
    treats it as an endpoint (yielding NULL fills), exactly as stored.
    This is carry-as-is semantics, NOT IGNORE-NULLS LOCF; pre-filter
    NULL-valued rows (``df.where(col.isNotNull())``) when the last
    NON-NULL observation should carry instead. Deliberate: silently
    skipping NULLs inside the operator would conflate "sensor sent
    nothing" with "sensor sent an explicit null".

    ``max_gap_buckets`` bounds ONE gap's width (buckets between two
    consecutive observations of a key). Each segment materializes its
    grid as one in-task array, so a pathological key — e.g. observed
    twice a year on a millisecond grid — would otherwise build a
    multi-billion-element array and blow the task. Exceeding the bound
    raises at execution time (explicit failure beats a mystery OOM);
    pass ``None`` to disable.
    """
    if not fills:
        raise ValueError("gapfill: no fill columns given")
    for c, m in fills.items():
        if m not in ("locf", "linear", "zero", "null"):
            raise ValueError(f"gapfill: unknown method {m!r} for column {c!r}")
    interval = F.expr(f"INTERVAL {step}")
    w = Window.partitionBy(*keys).orderBy(time_col)
    seg = df.withColumn("_nxt_t", F.lead(time_col).over(w))
    linear_cols = [c for c, m in fills.items() if m == "linear"]
    for col in linear_cols:
        seg = seg.withColumn(f"_nxt_{col}", F.lead(col).over(w))
    # each observation owns the buckets [its own, next observation):
    # the last observation per key owns only itself — a gap after the
    # final observation does not exist (the grid ends at max(bts))
    grid_end = F.coalesce(F.col("_nxt_t") - interval, F.col(time_col))
    if max_gap_buckets is not None:
        # gap width in buckets, computed ARITHMETICALLY (before any
        # array exists)
        step_us = step_micros(step)
        # floor of the bucket count — the SAME comparison gapfill_stream
        # uses ((t - last_ns) // step_ns), so the twin guards trip on
        # identical gaps even when observations are off-grid
        n_gap = F.floor(
            (
                F.unix_micros(F.col("_nxt_t"))
                - F.unix_micros(F.col(time_col))
            )
            / step_us
        )
        # the guard lives INSIDE the sequence's end expression so column
        # pruning cannot drop it
        grid_end = F.when(
            n_gap > F.lit(max_gap_buckets),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"gapfill: gap wider than max_gap_buckets="
                        f"{max_gap_buckets} buckets at {time_col}="
                    ),
                    F.col(time_col).cast("string"),
                )
            ).cast("timestamp"),
        ).otherwise(grid_end)
    seg = seg.withColumn(
        "_grid",
        F.sequence(F.col(time_col), grid_end, interval),
    ).withColumn("_t", F.explode("_grid"))
    observed = F.col("_t") == F.col(time_col)
    out_cols = list(keys)
    for col, method in fills.items():
        v = F.col(col)
        if method == "null":
            filled = F.when(observed, v)
        elif method == "zero":
            filled = F.when(observed, v).otherwise(
                F.lit(0).cast(df.schema[col].dataType)
            )
        elif method == "locf":
            filled = v  # the segment's own value IS the last observation
        else:  # linear: local lerp between the segment's two endpoints
            nv = F.col(f"_nxt_{col}")
            frac = (
                (F.unix_micros(F.col("_t")) - F.unix_micros(F.col(time_col)))
                .cast("double")
                / (
                    F.unix_micros(F.col("_nxt_t"))
                    - F.unix_micros(F.col(time_col))
                ).cast("double")
            )
            filled = (
                F.when(observed, v)
                .when(nv.isNull(), v)  # safety; unreachable on a segment grid
                .otherwise(F.round(v + (nv - v) * frac, 6))
            )
        out_cols.append(filled.alias(col))
    sel = [*keys, F.col("_t").alias(time_col), *out_cols[len(keys):]]
    if mark_gaps:
        sel.append((~observed).alias("is_gap"))
    return seg.select(*sel)


def resample(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    step: str,
    aggs: dict[str, "F.Column"],
    fills: dict[str, str],
    mark_gaps: bool = True,
    max_gap_buckets: int | None = 100_000,
) -> DataFrame:
    """Bucket → aggregate → gap-fill as ONE call — the single most
    common telemetry operation (downsample a raw event stream to a
    dense regular grid).

    ``aggs`` maps output column → aggregate Column (evaluated per
    (keys, step)-bucket); ``fills`` maps those output columns → gapfill
    method (``"locf"`` | ``"linear"`` | ``"zero"`` | ``"null"``). The
    raw corpus is touched exactly ONCE (the bucket aggregate, with
    map-side partial aggregation); everything after runs at the
    keys × buckets grain — gapfill's plan contract unchanged.
    """
    unknown = [c for c in fills if c not in aggs]
    if unknown:
        raise ValueError(f"resample: fill columns without an agg: {unknown}")
    # an agg column with no fill method appears NULL on gap rows
    fills = {**{c: "null" for c in aggs}, **fills}
    bucketed = (
        df.groupBy(*keys, F.window(time_col, step).alias("_w"))
        .agg(*[a.alias(c) for c, a in aggs.items()])
        .select(*keys, F.col("_w.start").alias(time_col), *aggs.keys())
    )
    return gapfill(
        bucketed, keys, time_col, step, fills, mark_gaps, max_gap_buckets
    )


def ewma(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    window: int = 16,
    out_col: str = "ewma",
) -> DataFrame:
    """Trailing-window EWMA with decay 1/2 per bucket, exact-replay
    arithmetic.

    ewma_t = Σ_{j=0..w-1} x_{t-j} · 2^{-j} / Σ_{j} 2^{-j} over the
    trailing ``window`` observed buckets (shorter at the head). The
    truncated window IS the scalable form — an unbounded recursive EWMA
    needs the full per-key history in one task, while the tail beyond
    16 half-lives is < 2^-16 of the weight.

    Determinism contract (the reason this shape, see module doc):
    weights 2^{i-1} come from integer ``shiftleft`` (exact), a double
    times an exact power of two only shifts the exponent (lossless),
    the fold is sequential oldest→newest, and the one division by the
    exact integer 2^n − 1 happens last. Replays bit-identically against
    DuckDB's LIST_SUM(LIST_TRANSFORM(...)) — no rounding slack needed
    before the final presentation rounding.

    NULL contract: ``collect_list`` drops NULL values, so a NULL bucket
    SHRINKS the window (the remaining values' weights renormalize over
    a shorter list) rather than contributing zero; a frame holding ONLY
    NULLs yields NULL. An oracle replaying
    this must filter NULLs symmetrically (DuckDB ``LIST()`` keeps
    them); run :func:`gapfill` first — its contract guarantees a dense,
    LOCF-carried grid — or pre-filter NULL rows.
    """
    if not 1 <= window <= 52:
        raise ValueError("ewma: window must be in [1, 52] (exact-float weights)")
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(-(window - 1), 0)
    )
    # pw[k+1] = 2^-k as an exact Python-float literal (k ≤ window) —
    # no runtime pow anywhere, so both engines index the SAME exact
    # doubles (F.shiftleft can't take a column shift; a literal table
    # sidesteps it entirely)
    pw = F.array(*[F.lit(2.0 ** -k) for k in range(window + 1)])
    xs = F.collect_list(F.col(value_col)).over(w)
    n = F.size(xs)
    # frame order is oldest→newest: element i (1-based) carries weight
    # 2^-(n-i); the product only shifts the exponent (lossless), the
    # fold is sequential, and the division happens once at the end
    weighted = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.element_at(xs, i) * F.element_at(pw, n - i + 1),
    )
    num = F.aggregate(weighted, F.lit(0.0), lambda acc, x: acc + x)
    denom = F.lit(2.0) - F.lit(2.0) * F.element_at(pw, n + 1)
    # an ALL-NULL frame (n = 0: e.g. a key's first bucket is NULL) must
    # yield NULL, not crash — unguarded, sequence(1, 0) descends and
    # element_at hits an invalid index, killing the job
    return df.withColumn(
        out_col, F.when(n > 0, F.round(num / denom, 6))
    )


def rolling_median(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    n_buckets: int = 7,
    out_col: str = "rmedian",
) -> DataFrame:
    """Exact median over the trailing ``n_buckets`` rows per key.

    Spark's ``percentile`` (exact, linear interpolation) over a ROWS
    frame ≡ DuckDB's ``QUANTILE_CONT`` over the same frame. The frame
    holds ≤ n_buckets values, so per-row cost is bounded regardless of
    corpus size; the only exchange is the keys hash partition shared
    with any other window at this grain."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(time_col)
        .rowsBetween(-(n_buckets - 1), 0)
    )
    med = F.expr(f"percentile({_bt(value_col)}, 0.5)").over(w)
    return df.withColumn(out_col, F.round(med, 6))


def mad_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Median / MAD fences per group: adds ``med``, ``mad`` and a
    BOOLEAN ``is_outlier`` (|x − med| > k·MAD).

    Robust where z-scores break: one 100 TB-scale wild value moves the
    mean and inflates the stddev enough to hide itself (the population
    z ceiling is √(n−1)); the median and MAD barely move.

    Plan shape: two chained UNBOUNDED window percentiles over the SAME
    ``partitionBy(group_cols)`` — ONE FileScan, ONE hash exchange, no
    aggregate+join branches. (The earlier agg/broadcast-join draft made
    Spark re-execute the shared input subplan once per branch — 4 scans
    of the corpus; the window form keeps every group's rows in one
    partition and computes both percentiles in place. Same trap the
    chi_square draft hit; see DEVNOTES.) MAD == 0 (over half the group
    identical) flags any deviation, matching the strict > fence.

    Scale bound: an EXACT percentile needs the whole group's values in
    one place in any formulation; the window form additionally keeps
    the group's rows co-located. Feed it a BOUNDED-group frame (the
    bucket grain: ≤ span/step rows per group) — for huge raw groups
    use approx_percentile fences instead.

    NULL group values form their OWN group (window partitioning
    semantics) and get their own fences — unlike an inner-join
    formulation, which silently drops those rows; an oracle replay
    must join null-safely (IS NOT DISTINCT FROM)."""
    wg = Window.partitionBy(*group_cols)
    vq = _bt(value_col)
    return (
        df.withColumn("med", F.expr(f"percentile({vq}, 0.5)").over(wg))
        .withColumn("mad", F.expr(f"percentile(abs({vq} - med), 0.5)").over(wg))
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("med")) > F.lit(k) * F.col("mad"),
        )
    )
