"""SCD Type-2 dimension maintenance: versioned history from observation
snapshots, incremental merge, and point-in-time views.

A warehouse dimension tracked "slowly changing dimension type 2" style
keeps one row per (key, version) with a [valid_from, valid_to) interval
instead of overwriting attributes in place. This module builds that
history functionally (no table format required — the output IS the new
dimension, writable to any sink):

- ``scd2_build``     snapshots → versioned dimension (change capture +
                     interval stitching, two window passes on one key
                     shuffle).
- ``scd2_merge``     incremental batch merge. Touches ONLY the keys
                     present in the batch (semi/anti join on a broadcast
                     key set); the contract is merge(dim, batch) ≡
                     build(history ∪ batch), which also makes
                     out-of-order/late snapshots correct by construction
                     — the affected key's history is re-stitched, not
                     appended to.
- ``scd2_snapshot``  dimension as of an instant (the point-in-time view
                     a training-data join needs).

Tie rules (deterministic everywhere): one snapshot per (key, ts) —
the highest ``order_cols`` wins; in a merge, a batch row beats an
existing version row at the same ts. Attribute comparisons are
null-safe (NULL ≡ NULL is "no change").

Scale shape: build is one shuffle on the key (both windows share the
partitioning); merge's cost is O(|batch| + |versions of affected keys|),
never a full-dimension rewrite — with the dimension bucketed by key the
untouched pass-through is scan + anti-join against a broadcast key set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_META = ("valid_from", "valid_to", "version", "is_current")


def _changed(attrs: list[str]) -> Column:
    """True where any attribute differs (null-safe) from the previous
    snapshot of the same key, or where there is no previous snapshot."""
    no_prev = F.col("_prev_seen").isNull()
    diffs = [~F.col(a).eqNullSafe(F.col(f"_prev_{a}")) for a in attrs]
    out = no_prev
    for d in diffs:
        out = out | d
    return out


def scd2_build(
    snapshots: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse observation snapshots (one row = "key had these attrs at
    ts") into an SCD2 dimension: keys + attrs + valid_from, valid_to
    (NULL = current), version (1-based per key), is_current.

    Consecutive snapshots with unchanged attributes collapse into one
    version; duplicate (key, ts) observations keep the row ranking
    highest by ``order_cols`` (descending, e.g. an event id).
    """
    if not keys or not attrs:
        raise ValueError("scd2_build: keys and attrs must be non-empty")
    order_cols = list(order_cols or [])
    ts = F.col(ts_col)

    base = snapshots.select(*keys, *attrs, ts.alias("valid_from"), *order_cols)
    if order_cols:
        wdup = Window.partitionBy(*keys, "valid_from").orderBy(
            *[F.desc(c) for c in order_cols]
        )
        base = (
            base.withColumn("_rn", F.row_number().over(wdup))
            .filter(F.col("_rn") == 1)
            .drop("_rn", *order_cols)
        )
    else:
        base = base.dropDuplicates([*keys, "valid_from"])

    wseq = Window.partitionBy(*keys).orderBy("valid_from")
    lagged = base.select(
        "*",
        F.lag(F.lit(1)).over(wseq).alias("_prev_seen"),
        *[F.lag(a).over(wseq).alias(f"_prev_{a}") for a in attrs],
    )
    changes = lagged.filter(_changed(attrs)).select(*keys, *attrs, "valid_from")
    return changes.select(
        *keys,
        *attrs,
        "valid_from",
        F.lead("valid_from").over(wseq).alias("valid_to"),
        F.row_number().over(wseq).alias("version"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    batch: DataFrame,
    keys: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    broadcast_keys: bool = True,
) -> DataFrame:
    """Merge a batch of new snapshots into an existing SCD2 dimension.

    Contract: ``scd2_merge(scd2_build(H1), H2) ≡ scd2_build(H1 ∪ H2)``
    for histories split on ts (the oracle-gated property). Late /
    out-of-order batches re-stitch the affected keys' histories from
    their STORED VERSIONS plus the batch — exact with respect to the
    dimension's own version history, which is the operational SCD2
    semantics, but NOT always the full-raw-history build, because the
    dimension is lossy in two documented ways:

    - ``scd2_build`` collapses unchanged snapshots, so a late row
      inserted BEFORE a collapsed snapshot cannot re-create the
      attr-flips the dropped snapshot would have caused (the evidence
      is gone from the dimension). H1 = {A@t1, A@t3} stores one
      version; merging a late B@t2 yields B current, where the full
      build of {A@t1, B@t2, A@t3} would end on A.
    - stored versions carry no ``order_cols`` values (the dimension
      never persists them), so a batch row at a ts that already has a
      stored version ALWAYS wins — replay-as-upsert semantics. Across
      SEPARATE merges, same-ts conflicts resolve by merge recency, not
      by the order value; ``order_cols`` ranks rows only within one
      call's batch.

    When late data may interleave with collapsed history and full
    raw-history fidelity matters, rebuild from the event log
    (``scd2_build`` over the full history) — the same backstop
    discipline as ``dedup_store``'s batch path.

    Only keys present in the batch are touched: everything else passes
    through by anti join (broadcast the batch key set when it is
    metadata-sized — the takedown/compliance case).
    """
    order_cols = list(order_cols or [])
    key_set = batch.select(*keys).distinct()
    probe = F.broadcast(key_set) if broadcast_keys else key_set
    untouched = dim.join(probe, keys, "left_anti")
    old_snaps = dim.join(probe, keys, "left_semi").select(
        *keys,
        *attrs,
        F.col("valid_from").alias(ts_col),
        F.lit(0).alias("_priority"),
        # stored versions carry no intra-ts sequence — NULL sorts below
        # any batch value, and _priority already ranks batch rows first
        *[
            F.lit(None).cast(t).alias(c)
            for c, t in zip(order_cols, _types(batch, order_cols))
        ],
    )
    new_snaps = batch.select(
        *keys, *attrs, F.col(ts_col), F.lit(1).alias("_priority"), *order_cols
    )
    rebuilt = scd2_build(
        old_snaps.unionByName(new_snaps),
        keys,
        attrs,
        ts_col,
        order_cols=["_priority", *order_cols],
    )
    return untouched.unionByName(rebuilt)


def _types(df: DataFrame, cols: list[str]) -> list[str]:
    by_name = dict(df.dtypes)
    return [by_name[c] for c in cols]


def scd2_snapshot(dim: DataFrame, at) -> DataFrame:
    """The dimension as of instant ``at``: the one version per key whose
    [valid_from, valid_to) interval contains it (keys created after
    ``at`` are absent)."""
    t = F.lit(at)
    return dim.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (t < F.col("valid_to")))
    )
