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
