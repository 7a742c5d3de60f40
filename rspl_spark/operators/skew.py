"""Skew-mitigation operators: salted replicated join and shuffle-safe
exact distinct counting.

Spark's own defenses cover part of the skew problem — map-side partial
aggregation collapses skewed groups for algebraic aggregates, and AQE's
skew-join splitting re-chunks oversized sort-merge partitions at
runtime. Two shapes remain hot at 100 TB:

- a shuffled hash/broadcast-ineligible join where one key holds a large
  share of the fact side (AQE splits SMJ partitions, but pre-salting
  bounds the partition size by construction and also covers shuffled
  hash joins);
- exact COUNT(DISTINCT v) per key, where partial aggregation cannot
  collapse anything (every distinct value must reach the reducer for
  its key — a single hot key serializes on one task).

Both rewrites are semantics-preserving, so their gate oracles are the
plain join / plain COUNT(DISTINCT) — the hash check proves the salt is
invisible in the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side's hot keys spread over ``n_salts``
    shuffle partitions: fact rows get a deterministic salt in
    [0, n_salts) hashed from ``salt_on`` (default: all fact columns —
    retry-stable, unlike rand()), the dim side is replicated n_salts
    times with an explode, and the join runs on (key, salt).

    Cost model: dim bytes × n_salts extra shuffle write against a
    bounded per-task fact partition. Use when the dim side is too big to
    broadcast and the fact key distribution is known-skewed; keep
    n_salts small (8–32) so the replication stays cheap.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    # Replicating the dim side n_salts times is only invisible when every
    # dim row needs a fact match to appear (inner/semi) or when unmatched
    # rows come from the un-replicated fact side (left/anti). For
    # right/full outer, an unmatched dim row would surface once per salt.
    # "cross" is excluded too: the join runs ON (key, _salt), so a cross
    # request would silently degenerate to an inner equi-join.
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join does not preserve semantics for how={how!r}: "
            "dim rows without a fact match would appear n_salts times. "
            "Use inner/left/semi/anti, or a plain join for outer variants."
        )
    if "_salt" in fact.columns or "_salt" in dim.columns:
        raise ValueError(
            "input already has a '_salt' column; rename it before salted_join"
        )
    cols = salt_on if salt_on is not None else fact.columns
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)))
    # explode must be top-level (generators can't nest in a cast)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    return f.join(d, [key, "_salt"], how).drop("_salt")


def skew_safe_count_distinct(
    df: DataFrame, keys: list[str], value: str | Column
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) in two uniform shuffles:
    dedupe on (keys…, value) — a shuffle keyed by the VALUE-bearing
    tuple, uniform even when one key dominates — then count per key,
    which partial-aggregates (each map task emits one partial count per
    key). No single task ever sees a hot key's full value set.

    Output: (keys…, n_distinct). NULL values are ignored, matching SQL
    COUNT(DISTINCT): dropDuplicates keeps one (keys, NULL) row, but
    count(_v) skips it, so a NULL-only key yields 0.
    """
    if "_v" in keys:
        raise ValueError("'_v' cannot be a grouping key; rename it first")
    v = F.col(value) if isinstance(value, str) else value
    return (
        df.select(*keys, v.alias("_v"))
        .dropDuplicates([*keys, "_v"])
        .groupBy(*keys)
        .agg(F.count(F.col("_v")).cast("long").alias("n_distinct"))
    )
