"""Distribution-drift detection: two-sample Kolmogorov-Smirnov statistic
and the Population Stability Index (PSI).

A pipeline ingesting daily increments needs to notice when a source's
distribution moves — shorter documents, shifted quality scores, a new
crawler dumping boilerplate. The two-sample KS statistic
D = max_x |F_a(x) - F_b(x)| is the standard nonparametric answer, and
it is exactly computable with two shuffles: one groupBy on the value
(collapsing n rows to V distinct values, each carrying both groups'
counts), then cumulative sums over the value order. V — not n — bounds
the window work, and for continuous values the optional ``bins``
quantization caps V at a constant (histogram-KS, the standard practice
for drift monitors at scale). Integer counts everywhere until the final
two divisions, so an independent engine reproduces D exactly.

PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) is the complementary *magnitude*
monitor (KS is a max, so a broad small shift can hide from it; PSI sums
every bin's contribution — the credit-scoring industry's standard drift
alarm, typically actioned at 0.1/0.25). Same scale shape as histogram-KS:
one groupBy on the bin collapses n rows to B, Laplace smoothing keeps
empty bins finite, and the only float steps are two correctly-rounded
IEEE ops per bin (a division and one ln) plus a B-term sum — round(6)
absorbs the ≤1-ulp-per-term engine drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
    bins: int | None = None,
) -> DataFrame:
    """One-row DataFrame (d_stat, n_a, n_b) — the two-sample KS distance
    between ``value_col``'s distribution where ``in_a`` holds and where
    ``in_b`` holds. Rows in neither group are ignored; a row matching
    both predicates counts in both samples.

    ``bins`` quantizes values to that many equal-width buckets first
    (min/max from one scalar agg) — set it when the value is continuous
    or high-cardinality so the cumulative window runs over a bounded
    number of rows.
    """
    v = F.col(value_col).cast("double")
    if bins is not None:
        stats = df.filter(in_a | in_b).agg(
            F.min(v).alias("mn"), F.max(v).alias("mx")
        ).first()
        if stats["mn"] is None:
            raise ValueError("ks_statistic: no rows match either group")
        mn, mx = float(stats["mn"]), float(stats["mx"])
        span = (mx - mn) or 1.0
        v = F.least(
            F.floor((v - F.lit(mn)) * bins / F.lit(span)), F.lit(bins - 1)
        ).cast("double")
    # NULL values are excluded, matching psi_bins (whose spine drops
    # the NULL bin): counted, a NULL lands wherever the engine sorts it
    # in the cumulative window (Spark NULLS FIRST, DuckDB NULLS LAST),
    # making D depend on engine ordering instead of the data
    both = df.filter((in_a | in_b) & F.col(value_col).isNotNull()).select(
        v.alias("_v"),
        in_a.cast("long").alias("_a"),
        in_b.cast("long").alias("_b"),
    )
    per_value = both.groupBy("_v").agg(
        F.sum("_a").alias("ca"), F.sum("_b").alias("cb")
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_value.select(
        F.sum("ca").over(w).alias("cum_a"), F.sum("cb").over(w).alias("cum_b")
    )
    totals = both.agg(
        F.sum("_a").cast("long").alias("n_a"), F.sum("_b").cast("long").alias("n_b")
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .select(
            F.abs(
                F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
            ).alias("diff"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.max("diff").alias("d_stat"))
        .select("d_stat", "n_a", "n_b")
    )


def psi_bins(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
    bins: int = 16,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-bin PSI decomposition: (bin, c_a, c_b, p_a, p_b, contrib),
    one row per bin 0..bins-1 (the full spine, so empty bins carry
    their smoothed contribution and both engines see the same B terms).

    Equal-width bins over the pooled min/max (one scalar agg).
    Laplace smoothing: p_i = (c_i + s) / (n + s·B) — keeps ln finite on
    empty bins and preserves Σp = 1. contrib_i = (p_a−p_b)·ln(p_a/p_b)
    is individually ≥ 0 (sign(p−q) = sign(ln(p/q))), so PSI ≥ 0.

    Scale: ONE shuffle (groupBy bin → B rows); the spine join and the
    totals are broadcasts of ≤B rows. n never crosses the wire.
    """
    if bins < 2:
        raise ValueError("psi_bins: need at least 2 bins")
    if smoothing <= 0:
        raise ValueError("psi_bins: smoothing must be > 0 (keeps ln finite)")
    v = F.col(value_col).cast("double")
    stats = df.filter(in_a | in_b).agg(F.min(v).alias("mn"), F.max(v).alias("mx")).first()
    if stats["mn"] is None:
        raise ValueError("psi_bins: no rows match either group")
    mn, mx = float(stats["mn"]), float(stats["mx"])
    span = (mx - mn) or 1.0
    bin_col = F.least(
        F.floor((v - F.lit(mn)) * bins / F.lit(span)), F.lit(bins - 1)
    ).cast("long")
    counts = (
        df.filter(in_a | in_b)
        .select(
            bin_col.alias("bin"),
            in_a.cast("long").alias("_a"),
            in_b.cast("long").alias("_b"),
        )
        .groupBy("bin")
        .agg(F.sum("_a").alias("c_a"), F.sum("_b").alias("c_b"))
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    full = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("c_a", F.lit(0)).cast("long").alias("c_a"),
            F.coalesce("c_b", F.lit(0)).cast("long").alias("c_b"),
        )
    )
    totals = full.agg(
        F.sum("c_a").cast("long").alias("n_a"), F.sum("c_b").cast("long").alias("n_b")
    )
    s = float(smoothing)
    out = full.crossJoin(F.broadcast(totals)).select(
        "bin",
        "c_a",
        "c_b",
        "n_a",
        "n_b",
        ((F.col("c_a") + F.lit(s)) / (F.col("n_a") + F.lit(s * bins))).alias("p_a"),
        ((F.col("c_b") + F.lit(s)) / (F.col("n_b") + F.lit(s * bins))).alias("p_b"),
    )
    return out.select(
        "bin",
        "c_a",
        "c_b",
        "n_a",
        "n_b",
        "p_a",
        "p_b",
        ((F.col("p_a") - F.col("p_b")) * F.log(F.col("p_a") / F.col("p_b"))).alias(
            "contrib"
        ),
    )


def psi_statistic(
    df: DataFrame,
    value_col: str,
    in_a: Column,
    in_b: Column,
    bins: int = 16,
    smoothing: float = 0.5,
) -> DataFrame:
    """One-row DataFrame (psi, n_a, n_b) — the Population Stability Index
    between ``value_col``'s distribution where ``in_a`` holds and where
    ``in_b`` holds, over ``bins`` equal-width buckets. See ``psi_bins``."""
    b = psi_bins(df, value_col, in_a, in_b, bins=bins, smoothing=smoothing)
    return b.groupBy("n_a", "n_b").agg(F.sum("contrib").alias("psi")).select(
        "psi", "n_a", "n_b"
    )


def rate_anomalies(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    bucket: str = "minute",
    z: int = 3,
) -> DataFrame:
    """Per-key rate-spike detection: bucket events by time, flag buckets
    whose count deviates from the key's mean by more than ``z`` standard
    deviations. Output: key cols + bucket_ts, n (bucket count), flag
    (0/1), n_buckets.

    The decision is EXACT-INTEGER algebra carried in double: with
    S = Σc, SS = Σc² over a key's n buckets, (c − S/n)² > z²·var ⟺
    (n·c − S)² > z²·(n·SS − S²) — every FACTOR an exact integer
    (exact in double below 2^53; BIGINT products would overflow first,
    and Spark wraps where DuckDB promotes), so both sides are the same
    fixed chain of correctly-rounded IEEE ops in any engine and each
    flag reproduces bit-for-bit — unlike a σ-normalized z-score, whose
    sqrt/divide can flip a boundary bucket on 1-ulp drift. Population variance; keys with a single
    bucket flag nothing (variance undefined ⇒ 0 > 0 is false). Ceiling
    to know: one lone outlier among n buckets scores at most
    z = √(n−1) against population stats (exactly 3.0 at n=10) — size
    the window so n ≫ z² or a single spike can never cross.

    Scale: ONE scan — events collapse to the (key, bucket) grain in one
    groupBy and the per-key moments come from WINDOWS over those bucket
    rows (branching into a separate moments frame would re-derive the
    event scan: Spark re-executes shared subplans, it does not reuse
    them — plan-pinned in test_plan_properties.py). Empty buckets are
    NOT invented; for gap-sensitive monitors densify with a spine first.
    """
    if z < 1:
        raise ValueError("rate_anomalies: z must be >= 1")
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    counts = (
        df.select(*key_cols, b)
        .groupBy(*key_cols, "bucket_ts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wk = Window.partitionBy(*key_cols)
    j = counts.select(
        *key_cols,
        "bucket_ts",
        "n",
        F.count(F.lit(1)).over(wk).cast("long").alias("n_buckets"),
        F.sum("n").over(wk).cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).over(wk).cast("long").alias("ss"),
    )
    # the comparison runs in DOUBLE: every factor is an exact integer
    # (exact in double below 2^53), while BIGINT products (s², lhs²)
    # overflow long before 100 TB per-key event totals — and Spark
    # wraps where DuckDB promotes, so staying integral would diverge
    # cross-engine exactly when it matters (same fix as chi_square)
    nb, nd = F.col("n_buckets").cast("double"), F.col("n").cast("double")
    sd, ssd = F.col("s").cast("double"), F.col("ss").cast("double")
    lhs = nb * nd - sd
    cond = lhs * lhs > F.lit(float(z * z)) * (nb * ssd - sd * sd)
    return j.select(
        *key_cols,
        "bucket_ts",
        "n",
        cond.cast("long").alias("flag"),
        "n_buckets",
    )


def chi_square(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """One row (chi2, dof, n): Pearson's χ² independence statistic for
    two categorical columns. The third drift lens: KS/PSI watch one
    numeric distribution, rate_anomalies watches arrival counts, χ²
    watches whether two DISCRETE dimensions decouple (did language mix
    shift per source?).

    Per-cell term computed as (n·O − R·C)² / (n·R·C): every FACTOR is
    an exact integer carried in double (exact below 2^53 — BIGINT
    products would overflow first, and Spark wraps where DuckDB
    promotes), so each cell is a fixed chain of correctly-rounded IEEE
    ops that both engines reproduce; Σ over r·c cells then round(6).
    NULL categories are first-class levels (a missing language IS a
    category shift).

    Scale: ONE scan, one groupBy to the (a, b) contingency grain —
    margins come from WINDOWS over the cell rows (separate margin
    frames would each re-derive the corpus scan; Spark re-executes
    shared subplans). Observed-zero grid cells never materialize:
    their contribution Σ_absent E telescopes to n − Σ_present E
    because Σ_all R·C/n = n — so the full-grid statistic is computed
    from present cells alone. Plan-pinned single-scan.
    """
    # collision-proof NULL level: non-NULL values carry a "v:" prefix,
    # so the NULL sentinel can never merge with a genuine category
    # whose string form is '∅'
    def _lvl(c):
        col = F.col(c).cast("string")
        return F.when(col.isNull(), F.lit("∅")).otherwise(
            F.concat(F.lit("v:"), col)
        )

    cells = (
        df.select(
            _lvl(col_a).alias("_a"),
            _lvl(col_b).alias("_b"),
        )
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    wa = Window.partitionBy("_a")
    wb = Window.partitionBy("_b")
    wall = Window.partitionBy()
    en = cells.select(
        "_a",
        "_b",
        "o",
        F.sum("o").over(wa).cast("long").alias("r"),
        F.sum("o").over(wb).cast("long").alias("c"),
        F.sum("o").over(wall).cast("long").alias("n"),
    )
    # every factor is an exact integer, but num² and n·R·C overflow
    # BIGINT long before 100 TB row counts (and Spark wraps where
    # DuckDB promotes) — so the products run in DOUBLE: inputs < 2^53
    # are exact, and IEEE multiplication/division round identically in
    # both engines.
    nd, od = F.col("n").cast("double"), F.col("o").cast("double")
    rd, cd = F.col("r").cast("double"), F.col("c").cast("double")
    num = nd * od - rd * cd
    termed = en.select(
        "_a",
        "_b",
        "n",
        (num * num / (nd * rd * cd)).alias("term"),
        (rd * cd / nd).alias("e"),
    )
    return termed.agg(
        # chi2 = Σ_present (O−E)²/E + Σ_absent E, and Σ_absent E = n − Σ_present E
        F.round(
            F.sum("term") + F.max("n").cast("double") - F.sum("e"), 6
        ).alias("chi2"),
        (
            (F.count_distinct("_a") - 1) * (F.count_distinct("_b") - 1)
        ).cast("long").alias("dof"),
        F.max("n").cast("long").alias("n"),
    )
