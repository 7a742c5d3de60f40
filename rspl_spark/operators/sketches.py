"""Mergeable frequency sketches: count-min for heavy hitters.

Exact top-k token counting (q_top_bigrams) shuffles the full
(token, count) space; at 100 TB the vocabulary of a web corpus is
billions of keys and the long tail is worthless. A count-min sketch
(Cormode & Muthukrishnan 2005) bounds the state at d x w integers per
partition, is MERGEABLE by plain cell-wise addition (so Spark's
partial-aggregation does the distributed merge for free — the shuffle
carries at most d*w rows per partition regardless of input size), and
answers point frequency queries with one-sided error: estimates never
undershoot, and overshoot by at most eps*N with probability 1-delta for
w = ceil(e/eps), d = ceil(ln(1/delta)).

Hashes are the repo's portable md5 idiom, so a SQL engine replays the
sketch cell-for-cell — integer counts, no float drift anywhere — and
the q_heavy_hitters_cms gate is an exact hash check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _fields(h: Column, d: int, w: int) -> list[Column]:
    """The d bucket indices from ONE portable md5 hash column ``h``:
    disjoint 20-bit fields of the 60 hash bits, each mod w. md5 bits
    are independent, so the d row-hashes are too — and one digest
    instead of d cuts the dominant cost of the sketch build (the
    md5+conv projection) by d. Integer-only, so SQL replays exactly."""
    if not 1 <= d <= 3:
        raise ValueError(f"d={d}: one 60-bit hash yields at most 3 20-bit rows")
    if w > (1 << 20):
        raise ValueError(f"w={w} exceeds the 20-bit field")
    return [(F.shiftright(h, 20 * i) % (1 << 20)) % w for i in range(d)]


def cms_sketch(
    df: DataFrame, key_col: str, w: int = 64, d: int = 3, weight_col: str | None = None
) -> DataFrame:
    """Build the sketch: (i, bucket, c) with at most d*w rows.

    One narrow pass computes each key's d buckets (posexplode), then a
    single partial-agg groupBy sums cell counts — the map side already
    collapses to <= d*w cells per task, which IS the sketch merge, so
    the exchange never carries more than d*w rows per partition
    whatever the corpus size. ``weight_col`` turns it into a weighted
    frequency sketch (default: each row counts 1)."""
    from rspl_spark.operators.dedup import portable_hash

    wcol = F.col(weight_col) if weight_col else F.lit(1)
    # NULL/zero/negative weights are excluded (like pagerank's w > 0
    # filter): a negative weight would let cells sum BELOW the true
    # positive mass and cms_estimate's min-over-rows would undershoot,
    # silently voiding the sketch's one-sided error guarantee
    if weight_col:
        df = df.filter(F.col(weight_col) > 0)
    # hash in a CHILD projection: one md5 per key, referenced d times.
    # Inlining portable_hash into the d array slots is NOT CSE'd by
    # codegen (measured 3x the md5 cost at 27.5M tokens, DEVNOTES r6);
    # CollapseProject keeps the split because _h is non-cheap and
    # multiply-referenced.
    # NULL keys hash to NULL and would materialize phantom NULL-bucket
    # cells; count-distinct/frequency semantics ignore NULLs.
    pre = df.filter(F.col(key_col).isNotNull()).select(
        portable_hash(F.col(key_col).cast("string")).alias("_h"), wcol.alias("_w")
    )
    buckets = F.array(*_fields(F.col("_h"), d, w))
    return (
        pre.select(F.posexplode(buckets).alias("i", "bucket"), "_w")
        .groupBy("i", "bucket")
        .agg(F.sum("_w").cast("long").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches of the same shape: cell-wise addition."""
    return (
        a.unionByName(b)
        .groupBy("i", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, w: int = 64, d: int = 3
) -> DataFrame:
    """Point-frequency estimates for each key in ``keys``: min over the
    d rows of the key's cell counts. The sketch is <= d*w rows —
    broadcast — so the probe is a narrow map-side join however many
    keys are probed. Non-NULL keys hashing to empty cells estimate 0;
    NULL probe keys are dropped (no output row) — the portable hash is
    undefined on NULL, so a NULL key has no cells to probe."""
    from rspl_spark.operators.dedup import portable_hash

    pre = keys.filter(F.col(key_col).isNotNull()).select(
        key_col, portable_hash(F.col(key_col).cast("string")).alias("_h")
    )
    buckets = F.array(*_fields(F.col("_h"), d, w))
    probes = pre.select(
        key_col, F.posexplode(buckets).alias("i", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def cms_bucket_sql(key_expr: str, i: int, w: int) -> str:
    """DuckDB mirror of :func:`_fields`' row i for oracle SQL."""
    h = f"CAST('0x' || SUBSTR(MD5(CAST({key_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    return f"(({h} // {1 << (20 * i)}) % {1 << 20}) % {w}"


# --- HyperLogLog ------------------------------------------------------------
#
# approx_count_distinct is the right call in production, but its HLL++
# register hash is engine-private, so a cross-engine oracle can't replay
# it. This implementation (Flajolet et al. 2007) uses the repo's
# portable md5 hash and keeps the register merge integer-exact, so a
# SQL engine reproduces the ESTIMATE bit-for-bit: the harmonic-mean
# denominator sum(2^-M_j) is computed as the exact integer
# sum(2^(WBITS+1-M_j)) (every term a power of two <= 2^52, total < 2^62
# — no float accumulation anywhere, hence no order sensitivity), and
# the final division's long->double promotion is the same IEEE rounding
# on both engines. Like the CMS, registers are MERGEABLE by max() — the
# map-side partial agg IS the distributed merge, and the shuffle
# carries at most m rows per partition per group whatever the corpus.

HLL_P = 9  # m = 512 registers; relative error ~ 1.04/sqrt(m) = 4.6%
_HLL_WBITS = 60 - HLL_P  # md5 portable hash yields 60 bits


def hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, key_col: str, group_cols: tuple[str, ...] = (), p: int = HLL_P
) -> DataFrame:
    """Register table: (group..., idx, mj) with <= m rows per group.

    idx = h mod m; mj = max over keys of the rank (leading zeros + 1)
    of the remaining WBITS-bit suffix. A narrow projection plus one
    partial-agg groupBy — same scale shape as cms_sketch."""
    from rspl_spark.operators.dedup import portable_hash

    if not 4 <= p <= 18:
        raise ValueError(f"hll_registers: p={p} outside [4, 18]")
    m = 1 << p
    wbits = 60 - p
    # hash in a CHILD projection referenced by idx and both rank
    # branches. Measured neutral here (plain Project slots DO get
    # subexpression elimination — unlike the posexplode array slots in
    # cms_sketch, where inlining cost 3x, DEVNOTES r6); the explicit
    # split guarantees single evaluation rather than relying on it.
    # NULL keys would create one phantom register per group (NULL idx,
    # NULL mj — consistently on both engines, but semantically wrong:
    # COUNT(DISTINCT x) ignores NULLs). Drop them first.
    pre = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols, portable_hash(F.col(key_col).cast("string")).alias("_h")
    )
    # m = 2^p, so the split is exact bit arithmetic — h/m through
    # doubles would round above 2^53 and corrupt the suffix.
    w = F.shiftright(F.col("_h"), p)
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        pre.select(*group_cols, F.pmod(F.col("_h"), m).alias("idx"), rank.alias("rank"))
        .groupBy(*group_cols, "idx")
        .agg(F.max("rank").cast("long").alias("mj"))
    )


def hll_estimate(
    registers: DataFrame, group_cols: tuple[str, ...] = (), p: int = HLL_P
) -> DataFrame:
    """Cardinality estimate per group from a register table.

    Raw estimate E = alpha * m^2 / sum(2^-M_j) with the denominator
    exact-integer as documented above; alpha * m^2 * 2^WBITS+1 is
    folded into ONE Python-computed double literal so neither engine
    does float arithmetic beyond the single final division. The
    small-range (linear counting) branch E <= 2.5m uses ln(m/V) —
    deterministic for a given (m, V) up to libm ULP, which round(2)
    absorbs; the hash gate runs at cardinalities far above the branch."""
    m = 1 << p
    wbits = 60 - p
    numer = hll_alpha(m) * m * m * float(1 << (wbits + 1))
    # shiftleft() in the DSL only takes a literal shift; expr() allows
    # the per-register column shift (all integer math, exact)
    term = F.expr(f"shiftleft(cast(1 as bigint), cast({wbits + 1} - mj as int))")
    # coalesce: with NO touched registers (empty table, global agg)
    # F.sum is NULL and the estimate would go NULL instead of 0.0 —
    # the linear-counting branch with v = m gives the correct 0
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(F.sum(term), F.lit(0)).cast("long").alias("s_touched"),
        F.count(F.lit(1)).cast("long").alias("n_touched"),
    )
    # empty registers contribute 2^(wbits+1) each (M_j = 0)
    s = F.col("s_touched") + (F.lit(m) - F.col("n_touched")) * F.lit(
        1 << (wbits + 1)
    ).cast("long")
    raw = F.lit(numer) / s.cast("double")
    v = (F.lit(m) - F.col("n_touched")).cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 2).alias("approx_distinct")
    )


def rolling_distinct_hll(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    step: str = "1 day",
    window_buckets: int = 7,
    p: int = HLL_P,
) -> DataFrame:
    """(bts, approx_distinct) — approximate distinct ``key_col`` over
    the trailing ``window_buckets`` time buckets, for every bucket with
    at least one in-window observation.

    THE scale pattern for "distinct users in the last 7 days" at
    100 TB: an exact sliding COUNT(DISTINCT) must either re-scan each
    window (W× the corpus) or hold every (bucket, key) pair in a
    window state; HLL registers are max-MERGEABLE, so each bucket's
    registers are built once (one partial-agg pass) and every window
    is a register-grain max — corpus touched exactly once. Shape:
    bucket registers (≤ m rows/bucket) → each register row covers the
    W windows it can influence (sequence/explode, ≤ W·m rows/bucket,
    corpus-independent) → max-merge per (window, idx) → estimate.
    Replayable in SQL (same registers + estimate literals as hll_sql),
    unlike a stateful sliding sketch."""
    if window_buckets < 1:
        raise ValueError("rolling_distinct_hll: window_buckets must be >= 1")
    from rspl_spark.operators.timeseries import step_micros

    step_us = step_micros(step)
    with_b = df.withColumn(
        "_bidx", F.floor(F.unix_micros(F.col(ts_col).cast("timestamp")) / step_us)
    )
    # registers are BOTH exploded and max-scanned (bounds) — materialize
    # the (small, ≤ m rows/bucket) register frame once so the branch
    # does not re-execute the corpus scan (the shared-subplan trap;
    # DEVNOTES round-8 lesson #2)
    reg = hll_registers(with_b, key_col, ("_bidx",), p).localCheckpoint()
    bounds = reg.agg(F.max("_bidx").alias("_maxb"))
    exploded = reg.crossJoin(F.broadcast(bounds)).select(
        F.explode(
            F.sequence(
                F.col("_bidx"),
                F.least(F.col("_bidx") + (window_buckets - 1), F.col("_maxb")),
            )
        ).alias("_bout"),
        "idx",
        "mj",
    )
    merged = exploded.groupBy("_bout", "idx").agg(F.max("mj").alias("mj"))
    est = hll_estimate(merged, ("_bout",), p)
    return est.select(
        F.timestamp_micros(
            (F.col("_bout") * step_us).cast("long")
        ).alias("bts"),
        "approx_distinct",
    )


def hll_sql(
    table_expr: str,
    key_expr: str,
    group_exprs: tuple[str, ...] = (),
    p: int = HLL_P,
) -> str:
    """DuckDB mirror of hll_registers + hll_estimate (raw branch +
    linear-counting branch, same literals)."""
    m = 1 << p
    wbits = 60 - p
    numer = repr(hll_alpha(m) * m * m * float(1 << (wbits + 1)))
    gsel = "".join(f"{g}, " for g in group_exprs)
    gby = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    gby_idx = "GROUP BY " + ", ".join(list(group_exprs) + ["idx"])
    h = f"CAST('0x' || SUBSTR(MD5(CAST({key_expr} AS VARCHAR)), 1, 15) AS BIGINT)"
    return f"""
hreg AS (
  SELECT {gsel}idx, CAST(MAX(rank) AS BIGINT) AS mj FROM (
    SELECT {gsel}h % {m} AS idx,
           CASE WHEN h // {m} = 0 THEN {wbits + 1}
                ELSE {wbits + 1} - LENGTH(BIN(h // {m})) END AS rank
    FROM (SELECT {gsel}{h} AS h FROM {table_expr}
          WHERE {key_expr} IS NOT NULL) t
  ) r {gby_idx}
),
hagg AS (
  SELECT {gsel}
         CAST(SUM(1::BIGINT << CAST({wbits + 1} - mj AS INT)) AS BIGINT)
           + ({m} - COUNT(*)) * (1::BIGINT << {wbits + 1}) AS s,
         {m} - COUNT(*) AS v
  FROM hreg {gby}
),
hest AS (
  SELECT {gsel}
         ROUND(CASE WHEN {numer} / CAST(s AS DOUBLE) <= {2.5 * m}
                     AND v > 0
                    THEN {float(m)!r} * LN({float(m)!r} / CAST(v AS DOUBLE))
                    ELSE {numer} / CAST(s AS DOUBLE) END, 2) AS approx_distinct
  FROM hagg
)"""


# --- Histogram quantiles ----------------------------------------------------
#
# approx_percentile's t-digest is engine-private (same story as HLL++);
# the replayable scale-native alternative is a fixed-bin equi-width
# histogram: integer bin counts are MERGEABLE by addition (partial agg
# IS the merge; shuffle <= nbins rows per partition per group), and the
# quantile estimate is linear interpolation inside the bin where the
# cumulative count crosses q*N — every intermediate an exact integer or
# an identically-promoted double, so DuckDB reproduces the estimate
# bit-for-bit. Error bound: one bin width (range/nbins). Together with
# CMS (frequency) and HLL (cardinality) this completes the bounded-
# state sketch trio.


def _hist_bin_expr(v: Column, lo: Column, hi: Column, nbins: int) -> Column:
    """Shared equi-width bin index: clamp into [0, nbins-1]; degenerate
    range (hi == lo) → bin 0. hist_quantiles AND rolling_hist_quantiles
    use this exact op tree, and their DuckDB oracles mirror it — one
    definition so the copies cannot drift out of hash parity."""
    width = (hi - lo) / F.lit(float(nbins))
    return F.when(hi == lo, F.lit(0)).otherwise(
        F.least(F.lit(nbins - 1), F.floor((v - lo) / width).cast("int"))
    )


def _hist_interp_expr(
    bin_: Column, target: Column, prev: Column, cnt: Column,
    lo: Column, hi: Column, nbins: int,
) -> Column:
    """Shared in-bin linear interpolation (same parity contract as
    :func:`_hist_bin_expr`)."""
    width = (hi - lo) / F.lit(float(nbins))
    return F.when(hi == lo, lo).otherwise(
        lo
        + width
        * (
            bin_.cast("double")
            + (target - prev.cast("double")) / cnt.cast("double")
        )
    )


def hist_quantiles(
    df: DataFrame,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_cols: tuple[str, ...] = (),
    nbins: int = 256,
) -> DataFrame:
    """(group..., q, est) — histogram-interpolated quantiles per group.

    Range [lo, hi] is the group's exact min/max (one partial-agg pass,
    broadcast back); bin width (hi-lo)/nbins; values at hi clamp into
    the last bin. A degenerate group (hi == lo) estimates lo for every
    q. Two shuffles total: the min/max/count agg and the <= nbins-row
    bin-count agg."""
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"hist_quantiles: quantiles must lie in (0, 1]: {qs}")
    if nbins < 2:
        raise ValueError(f"hist_quantiles: nbins={nbins} < 2")
    g = list(group_cols)
    # NULL values: _n (COUNT(col)) already excludes them, so the bins
    # must too — and a NULL bin would sort FIRST in Spark's cumulative
    # window but LAST under DuckDB's ORDER BY, shifting every
    # cumulative count between engines.
    df = df.filter(F.col(col).isNotNull())
    stats = df.groupBy(*g).agg(
        F.min(col).cast("double").alias("_lo"),
        F.max(col).cast("double").alias("_hi"),
        F.count(col).cast("long").alias("_n"),
    )
    j = df.join(F.broadcast(stats), g) if g else df.crossJoin(F.broadcast(stats))
    bin_ = _hist_bin_expr(
        F.col(col).cast("double"), F.col("_lo"), F.col("_hi"), nbins
    )
    bins = (
        j.select(*g, "_lo", "_hi", "_n", bin_.alias("_bin"))
        .groupBy(*g, "_lo", "_hi", "_n", "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    )
    w = Window.partitionBy(*g).orderBy("_bin") if g else Window.orderBy("_bin")
    cum = bins.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_prev", F.col("_cum") - F.col("_cnt")
    )
    qdf = cum.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    t = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "_target", F.col("q") * F.col("_n").cast("double")
    )
    hit = t.filter(
        (F.col("_prev").cast("double") < F.col("_target"))
        & (F.col("_target") <= F.col("_cum").cast("double"))
    )
    est = _hist_interp_expr(
        F.col("_bin"), F.col("_target"), F.col("_prev"), F.col("_cnt"),
        F.col("_lo"), F.col("_hi"), nbins,
    )
    return hit.select(*g, "q", F.round(est, 4).alias("est"))


def hist_quantiles_sql(
    table_expr: str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_exprs: tuple[str, ...] = (),
    nbins: int = 256,
) -> str:
    """DuckDB mirror of :func:`hist_quantiles` (CTE chain ending in
    ``hq``). Bin counts are integers and the interpolation applies the
    same operations in the same order, so estimates hash-match."""
    g = list(group_exprs)
    gsel = "".join(f"{x}, " for x in g)
    dsel = "".join(f"d.{x}, " for x in g)
    gby = ("GROUP BY " + ", ".join(g)) if g else ""
    on = (" AND ".join(f"d.{x} = s.{x}" for x in g)) or "TRUE"
    part = ("PARTITION BY " + ", ".join(f"b.{x}" for x in g)) if g else ""
    qvals = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
hstats AS (
  SELECT {gsel}CAST(MIN({col}) AS DOUBLE) AS _lo,
         CAST(MAX({col}) AS DOUBLE) AS _hi,
         CAST(COUNT({col}) AS BIGINT) AS _n
  FROM {table_expr} {gby}
),
hbins AS (
  SELECT {dsel}s._lo, s._hi, s._n,
         CASE WHEN s._hi = s._lo THEN 0
              ELSE LEAST({nbins - 1},
                         CAST(FLOOR((CAST(d.{col} AS DOUBLE) - s._lo)
                                    / ((s._hi - s._lo) / {float(nbins)!r})) AS INT))
         END AS _bin,
         CAST(COUNT(*) AS BIGINT) AS _cnt
  FROM {table_expr} d JOIN hstats s ON {on}
  WHERE d.{col} IS NOT NULL
  GROUP BY ALL
),
hcum AS (
  SELECT b.*, CAST(SUM(_cnt) OVER ({part} ORDER BY _bin
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS _cum
  FROM hbins b
),
hq AS (
  SELECT {gsel}q,
         ROUND(CASE WHEN _hi = _lo THEN _lo
                    ELSE _lo + ((_hi - _lo) / {float(nbins)!r})
                          * (CAST(_bin AS DOUBLE)
                             + (q * CAST(_n AS DOUBLE) - CAST(_cum - _cnt AS DOUBLE))
                               / CAST(_cnt AS DOUBLE))
               END, 4) AS est
  FROM hcum CROSS JOIN (VALUES {qvals}) qs(q)
  WHERE CAST(_cum - _cnt AS DOUBLE) < q * CAST(_n AS DOUBLE)
    AND q * CAST(_n AS DOUBLE) <= CAST(_cum AS DOUBLE)
)"""


def rolling_hist_quantiles(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    step: str = "1 day",
    window_buckets: int = 7,
    qs: tuple[float, ...] = (0.5, 0.95),
    nbins: int = 256,
) -> DataFrame:
    """(bts, q, est) — histogram-interpolated quantiles of
    ``value_col`` over the trailing ``window_buckets`` buckets ("p95
    latency per rolling 7 days"): the quantile sibling of
    :func:`rolling_distinct_hll`, same merge shape.

    Bin counts are ADDITIVE, so each bucket is binned once (one pass)
    and every window is a bin-grain sum — an exact sliding percentile
    would re-sort each window's raw rows (W× the corpus). The bin
    range is the GLOBAL [min, max] (merged histograms must share a
    range), so the error bound is global-range/nbins — wider than a
    per-window histogram's; raise ``nbins`` for spiky distributions.
    Two corpus passes total (range, then binning — inherent to a
    data-driven equi-width range, same as hist_quantiles); everything
    after runs at bin grain. Interpolation replays hist_quantiles'
    exact formula, so a DuckDB replay hash-matches."""
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"rolling_hist_quantiles: quantiles must lie in (0, 1]: {qs}")
    if nbins < 2:
        raise ValueError(f"rolling_hist_quantiles: nbins={nbins} < 2")
    if window_buckets < 1:
        raise ValueError("rolling_hist_quantiles: window_buckets must be >= 1")
    from rspl_spark.operators.timeseries import step_micros

    step_us = step_micros(step)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / step_us
        ).alias("_bidx"),
        F.col(value_col).cast("double").alias("_v"),
    )
    # the 1-row range frame is consumed TWICE (binning and the final
    # interpolation) — materialize it so each use doesn't re-run the
    # corpus min/max pass
    stats = base.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    ).localCheckpoint()
    j = base.crossJoin(F.broadcast(stats))
    bin_ = _hist_bin_expr(F.col("_v"), F.col("_lo"), F.col("_hi"), nbins)
    # bin grain (≤ buckets × nbins rows) is both exploded and
    # max-scanned — checkpoint so the bounds branch does not re-run
    # the corpus passes (the shared-subplan trap)
    binned = (
        j.select("_bidx", bin_.alias("_bin"))
        .groupBy("_bidx", "_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
        .localCheckpoint()
    )
    bounds = binned.agg(F.max("_bidx").alias("_maxb"))
    exploded = binned.crossJoin(F.broadcast(bounds)).select(
        F.explode(
            F.sequence(
                F.col("_bidx"),
                F.least(F.col("_bidx") + (window_buckets - 1), F.col("_maxb")),
            )
        ).alias("_bout"),
        "_bin",
        "_cnt",
    )
    merged = exploded.groupBy("_bout", "_bin").agg(
        F.sum("_cnt").cast("long").alias("_cnt")
    )
    wq = Window.partitionBy("_bout")
    wcum = Window.partitionBy("_bout").orderBy("_bin")
    cum = (
        merged.withColumn("_n", F.sum("_cnt").over(wq).cast("long"))
        .withColumn("_cum", F.sum("_cnt").over(wcum).cast("long"))
        .withColumn("_prev", F.col("_cum") - F.col("_cnt"))
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    t = (
        cum.crossJoin(F.broadcast(qdf))
        .crossJoin(F.broadcast(stats))
        .withColumn("_target", F.col("q") * F.col("_n").cast("double"))
    )
    hit = t.filter(
        (F.col("_prev").cast("double") < F.col("_target"))
        & (F.col("_target") <= F.col("_cum").cast("double"))
    )
    est = _hist_interp_expr(
        F.col("_bin"), F.col("_target"), F.col("_prev"), F.col("_cnt"),
        F.col("_lo"), F.col("_hi"), nbins,
    )
    return hit.select(
        F.timestamp_micros((F.col("_bout") * step_us).cast("long")).alias("bts"),
        "q",
        F.round(est, 4).alias("est"),
    )


def hist_estimate_from_bins(
    bins: DataFrame,
    lo: float,
    hi: float,
    nbins: int,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group..., q, est) — quantiles interpolated from a FIXED-RANGE
    bin-count table (the :func:`~rspl_spark.streaming.analytics.
    streaming_hist` sink shape: group..., bin, cnt).

    The batch :func:`hist_quantiles` derives [lo, hi] from the data;
    here the range was pinned at binning time, so the caller passes it
    back. Interpolation is the same formula (cumulative counts, linear
    within the hit bin), so for identical bins the estimates are
    identical. Inputs are <= nbins rows per group — driver-light,
    broadcast-sized — which is what makes a per-micro-batch live
    estimate essentially free."""
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"hist_estimate_from_bins: quantiles must lie in (0, 1]: {qs}")
    g = list(group_cols)
    width = (hi - lo) / float(nbins)
    totals = bins.groupBy(*g).agg(F.sum("cnt").cast("long").alias("_n"))
    j = bins.join(F.broadcast(totals), g) if g else bins.crossJoin(F.broadcast(totals))
    w = Window.partitionBy(*g).orderBy("bin") if g else Window.orderBy("bin")
    cum = j.withColumn("_cum", F.sum("cnt").over(w)).withColumn(
        "_prev", F.col("_cum") - F.col("cnt")
    )
    qdf = bins.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    t = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "_target", F.col("q") * F.col("_n").cast("double")
    )
    hit = t.filter(
        (F.col("_prev").cast("double") < F.col("_target"))
        & (F.col("_target") <= F.col("_cum").cast("double"))
    )
    est = F.lit(lo) + F.lit(width) * (
        F.col("bin").cast("double")
        + (F.col("_target") - F.col("_prev").cast("double"))
        / F.col("cnt").cast("double")
    )
    return hit.select(*g, "q", F.round(est, 4).alias("est"))


# --- Bloom filter -----------------------------------------------------------
#
# The membership sketch (Bloom 1970): "have we seen this key" with no
# false negatives and a tunable false-positive rate — the standard
# prefilter in front of an exact dedup store (skip the store probe for
# keys the filter rejects) or an anti-join against a huge key set.
# Spark ships bloom_filter_agg, but its bit layout is engine-private;
# this one uses the repo's portable md5 idiom so a SQL engine replays
# every bit — and every membership answer — exactly. Representation:
# (word, bits) rows, word = bit_position // 60, bits = BIT_OR of
# 1 << (position % 60) — at most ceil(m_bits / 60) rows however many
# keys are inserted, MERGEABLE by cell-wise BIT_OR (the partial agg IS
# the distributed merge, same scale argument as CMS/HLL/hist).


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 14, k: int = 3
) -> DataFrame:
    """Build the filter: (word, bits) with <= ceil(m_bits/60) rows.

    The k bit positions come from the same one-digest 20-bit field
    split as the CMS (md5 evaluated ONCE per key in a child
    projection); NULL keys are ignored (membership semantics follow
    COUNT DISTINCT's NULL treatment)."""
    from rspl_spark.operators.dedup import portable_hash

    if not 1 <= k <= 3:
        raise ValueError(f"k={k}: one 60-bit hash yields at most 3 20-bit fields")
    if m_bits > (1 << 20):
        raise ValueError(f"m_bits={m_bits} exceeds the 20-bit field")
    pre = df.filter(F.col(key_col).isNotNull()).select(
        portable_hash(F.col(key_col).cast("string")).alias("_h")
    )
    positions = F.array(*_fields(F.col("_h"), k, m_bits))
    return (
        pre.select(F.explode(positions).alias("pos"))
        .select(
            (F.col("pos") / 60).cast("long").alias("word"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 60 as int))").alias("_m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(_m)").cast("long").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the two key sets: cell-wise BIT_OR."""
    return (
        a.unionByName(b)
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").cast("long").alias("bits"))
    )


def bloom_probe(
    sketch: DataFrame, keys: DataFrame, key_col: str, m_bits: int = 1 << 14, k: int = 3
) -> DataFrame:
    """(key, member): member = 1 iff ALL k of the key's bits are set —
    never 0 for an inserted key (no false negatives); 1 for a small
    hash-collision fraction of absent keys. The sketch broadcasts
    (<= ceil(m_bits/60) rows), so the probe is a narrow map-side join.
    NULL probe keys are dropped, as in cms_estimate."""
    from rspl_spark.operators.dedup import portable_hash

    pre = keys.filter(F.col(key_col).isNotNull()).select(
        key_col, portable_hash(F.col(key_col).cast("string")).alias("_h")
    )
    positions = F.array(*_fields(F.col("_h"), k, m_bits))
    probes = pre.select(key_col, F.explode(positions).alias("pos")).select(
        key_col,
        (F.col("pos") / 60).cast("long").alias("word"),
        F.expr("shiftleft(cast(1 as bigint), cast(pos % 60 as int))").alias("_m"),
    )
    hit = (
        F.when(
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_m"))) != 0, 1
        ).otherwise(0)
    )
    return (
        probes.join(F.broadcast(sketch), "word", "left")
        .select(key_col, hit.alias("_hit"))
        .groupBy(key_col)
        .agg(F.min("_hit").cast("long").alias("member"))
    )


def bloom_bit_sql(key_expr: str, i: int, m_bits: int) -> str:
    """DuckDB mirror of probe/build position i: (word, mask) pieces are
    derived from this bit position."""
    return cms_bucket_sql(key_expr, i, m_bits)


# --- CMS-prefiltered EXACT top-k (heavy hitters without the shuffle) --------


def cms_topk_exact(
    occurrences: DataFrame,
    key_col: str,
    k: int,
    w: int = 1 << 16,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT top-k heavy hitters without shuffling the full vocabulary.

    The naive exact top-k (groupBy(key).count() then TakeOrdered) moves
    every distinct key through one corpus-wide exchange — the documented
    anti-pattern that made q_top_bigrams the slowest text query at sf10.
    This keeps the result bit-identical while the shuffle only ever
    carries HIGH-FREQUENCY keys:

    1. one narrow pass builds a wide single-row count sketch (w cells,
       map-side collapse — the exchange carries <= w rows per task);
    2. every occurrence is annotated with its cell count via ONE
       broadcast join (a cell count >= the key's true count — an upper
       bound with probability 1, since all of a key's occurrences land
       in the same cell); occurrences whose upper bound misses the
       threshold are dropped BEFORE the aggregate, so the exact count
       shuffle sees only plausible heavy hitters;
    3. a driver-side refinement loop makes the filter provably lossless:
       for any survivor set C, the k-th largest EXACT count within C
       lower-bounds the universe's k-th count (C is a subset), so once
       threshold <= kth(C), every dropped key had upper bound < kth(C)
       <= kth(universe) and cannot belong to the top-k — including
       tie-breaks, because any key tied at the k-th count survives the
       filter (its upper bound >= its count >= threshold). If the seed
       threshold (k-th largest cell, driver-side from the tiny sketch)
       was too aggressive, the next round reruns with threshold =
       kth(C), which is guaranteed valid — at most two productive
       passes, plus halving retries when fewer than k keys survive.

    Returns (key_col, n) for the exact top-k in (n desc, key asc)
    order. Falls back to the naive exact aggregate after ``max_rounds``
    (degenerate distributions where the sketch cannot discriminate).
    NULL keys are ignored, matching the naive GROUP BY's semantics
    under a non-null key domain.

    Scale shape: 1 sketch pass + 1-2 filtered count passes, each a
    scan + broadcast hash join + an aggregate over the (skew-tiny)
    survivor set. No corpus-sized exchange anywhere; the sketch (w
    longs) broadcasts. Cost moves from shuffle-bound to scan-bound —
    exactly what a 1000-executor cluster scales out.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    spark = occurrences.sparkSession
    # the result carries the key at its NATIVE type on every return
    # path (collected rounds, empty input, post-max_rounds fallback) —
    # a hardcoded 'string' would fail or silently cast non-string keys
    out_schema = StructType(
        [
            StructField(key_col, occurrences.schema[key_col].dataType, True),
            StructField("n", LongType(), True),
        ]
    )
    occ = occurrences.filter(F.col(key_col).isNotNull())
    # internal bucketing uses xxhash64 on the NATIVE key, not the
    # md5 portable hash: this sketch is never replayed by an oracle —
    # correctness only needs the all-of-a-key-in-one-cell upper-bound
    # property, which any deterministic hash gives — and md5-per-row
    # (plus a string cast) was the dominant cost of both scans
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(w)).cast("long")
    sketch = (
        occ.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    cells = sorted((r["c"] for r in sketch.collect()), reverse=True)
    if not cells:
        return spark.createDataFrame([], out_schema)
    threshold = cells[k - 1] if len(cells) >= k else cells[-1]

    annotated = occ.select(F.col(key_col), bucket.alias("bucket")).join(
        F.broadcast(sketch), "bucket"
    )
    for _ in range(max_rounds):
        counts = (
            annotated.filter(F.col("c") >= threshold)
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        rows = counts.orderBy(F.desc("n"), F.asc(key_col)).limit(k).collect()
        if len(rows) < k and threshold > 1:
            threshold = max(1, threshold // 2)
            continue
        kth = rows[-1]["n"] if rows else 0
        if threshold <= kth or threshold <= 1:
            return spark.createDataFrame(
                [(r[key_col], r["n"]) for r in rows], out_schema
            )
        threshold = kth  # valid: kth(C) <= kth(universe); next pass final
    return (
        occ.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc(key_col))
        .limit(k)
    )


def hll_intersect_estimate(
    df: DataFrame,
    key_col: str,
    in_a: Column,
    in_b: Column,
    p: int = HLL_P,
) -> DataFrame:
    """One row (est_a, est_b, est_union, est_intersect): HLL set-algebra
    over ONE pass worth of sketches — |A∩B| ≈ |A| + |B| − |A∪B| by
    inclusion-exclusion, with the union sketch obtained by MERGING the
    two register tables (per-idx max), never by rescanning the data.
    The "audience overlap" primitive: two register tables of m rows
    each answer all four cardinalities; error compounds (three ±1.04/√m
    estimates), so size p for the intersection's magnitude, not the
    sets'. Register merge ≡ build-on-union is the mergeability law the
    sketch tests pin."""
    from rspl_spark.operators.dedup import portable_hash

    m = 1 << p
    wbits = 60 - p
    numer = hll_alpha(m) * m * m * float(1 << (wbits + 1))
    # ONE scan, ONE register groupBy: per idx keep BOTH sides' max rank
    # (the union register is greatest(mja, mjb) — merge without a third
    # derivation; branching into three register frames would re-run the
    # corpus scan each time, Spark re-executes shared subplans).
    pre = df.filter((in_a | in_b) & F.col(key_col).isNotNull()).select(
        portable_hash(F.col(key_col).cast("string")).alias("_h"),
        in_a.alias("_fa"),
        in_b.alias("_fb"),
    )
    w = F.shiftright(F.col("_h"), p)
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    regs = (
        pre.select(F.pmod(F.col("_h"), m).alias("idx"), rank.alias("_rk"), "_fa", "_fb")
        .groupBy("idx")
        .agg(
            F.max(F.when(F.col("_fa"), F.col("_rk"))).cast("long").alias("mja"),
            F.max(F.when(F.col("_fb"), F.col("_rk"))).cast("long").alias("mjb"),
        )
        .withColumn("mju", F.greatest("mja", "mjb"))
    )

    def _sv(mj: str):
        term = F.expr(
            f"shiftleft(cast(1 as bigint), cast({wbits + 1} - {mj} as int))"
        )
        touched = F.count(F.col(mj))
        # coalesce: an EMPTY side (every mj NULL) must estimate 0.0 via
        # linear counting, not propagate a NULL sum into s/raw/est
        s = F.coalesce(F.sum(term), F.lit(0).cast("long")) + (
            F.lit(m) - touched
        ) * F.lit(1 << (wbits + 1)).cast("long")
        return s, (F.lit(m) - touched).cast("double")

    def _est(s, v):
        raw = F.lit(numer) / s.cast("double")
        return F.round(
            F.when(
                (raw <= 2.5 * m) & (v > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / v),
            ).otherwise(raw),
            2,
        )

    sa, va = _sv("mja")
    sb, vb = _sv("mjb")
    su, vu = _sv("mju")
    one = regs.agg(
        _est(sa, va).alias("est_a"),
        _est(sb, vb).alias("est_b"),
        _est(su, vu).alias("est_union"),
    )
    return one.select(
        "est_a",
        "est_b",
        "est_union",
        F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 2).alias(
            "est_intersect"
        ),
    )
