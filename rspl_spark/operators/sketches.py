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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, i: int, w: int) -> Column:
    """Row i's bucket for ``key``: the repo's portable md5 hash (same
    value as DuckDB's CAST('0x'||SUBSTR(MD5(i||':'||key),1,15) AS
    BIGINT)) mod w."""
    from rspl_spark.operators.dedup import portable_hash

    return portable_hash(F.concat(F.lit(f"{i}:"), key)) % w


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
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    buckets = F.array(*[_bucket(F.col(key_col), i, w) for i in range(d)])
    return (
        df.select(F.posexplode(buckets).alias("i", "bucket"), wcol.alias("_w"))
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
    keys are probed. Keys hashing to empty cells estimate 0."""
    buckets = F.array(*[_bucket(F.col(key_col), i, w) for i in range(d)])
    probes = keys.select(
        key_col, F.posexplode(buckets).alias("i", "bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


def cms_bucket_sql(key_expr: str, i: int, w: int) -> str:
    """DuckDB mirror of :func:`_bucket` for oracle SQL."""
    return (
        f"CAST('0x' || SUBSTR(MD5('{i}:' || {key_expr}), 1, 15) AS BIGINT) % {w}"
    )


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

    m = 1 << p
    wbits = 60 - p
    h = portable_hash(F.col(key_col).cast("string"))
    # m = 2^p, so the split is exact bit arithmetic — h/m through
    # doubles would round above 2^53 and corrupt the suffix.
    w = F.shiftright(h, p)
    rank = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, F.pmod(h, m).alias("idx"), rank.alias("rank"))
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
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).cast("long").alias("s_touched"),
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
    FROM (SELECT {gsel}{h} AS h FROM {table_expr}) t
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
