"""Table diff: classify every key between two snapshots of a table as
inserted / deleted / changed / unchanged.

The reconciliation primitive behind replication checks, snapshot
regression audits, and CDC backfills: one full-outer join on the key,
null-safe comparison of every tracked column, no per-column passes.
At scale both sides shuffle once on the key (co-partitioned/bucketed
snapshots diff without any wide exchange); the changed-column list is
computed in-row from the joined pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_KINDS = ("inserted", "deleted", "changed", "unchanged")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key present in either snapshot: keys +
    ``change_kind`` + ``changed_cols`` (sorted array, empty unless
    changed). ``compare_cols`` defaults to all shared non-key columns.
    Comparison is null-safe per column (NULL ≡ NULL is unchanged), and
    the key join itself is null-safe too: a key containing NULL that
    appears in both snapshots is compared, not misreported as a
    deleted+inserted pair.

    Keys are assumed unique within each snapshot (this is a set diff,
    not a bag diff); run the `audit` uniqueness rule first when that
    isn't guaranteed — duplicate keys would multiply join rows here.
    """
    if not keys:
        raise ValueError("table_diff: keys must be non-empty")
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    if not compare_cols:
        raise ValueError("table_diff: no columns to compare")

    # internal aliases: `_o_k__<key>` / `_o_v__<col>` — the `k__`/`v__`
    # discriminator means a key and a compare column can never collide
    # (a column literally named "k_<key>" used to alias into the key
    # namespace under the old `_{side}_k_{key}` scheme)
    def prep(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            *[F.col(k).alias(f"_{side}_k__{k}") for k in keys],
            F.lit(1).alias(f"_present_{side}"),
            *[F.col(c).alias(f"_{side}_v__{c}") for c in compare_cols],
        )

    # null-safe key equality: a row whose key contains NULL and exists
    # in both snapshots must COMPARE, not split into a spurious
    # deleted+inserted pair. <=> is still an equi-join condition to
    # Catalyst (EqualNullSafe join keys plan as sort-merge/shuffled-hash
    # — no nested-loop regression), and the output key coalesces the
    # two sides (identical under <=>, including the NULL case).
    cond = None
    for k in keys:
        c = F.col(f"_o_k__{k}").eqNullSafe(F.col(f"_n_k__{k}"))
        cond = c if cond is None else cond & c
    j = prep(old, "o").join(prep(new, "n"), cond, "full_outer")
    key_out = [
        F.coalesce(F.col(f"_o_k__{k}"), F.col(f"_n_k__{k}")).alias(k) for k in keys
    ]
    changed_cols = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"_o_v__{c}").eqNullSafe(F.col(f"_n_v__{c}")), F.lit(c)
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    kind = (
        F.when(F.col("_present_o").isNull(), F.lit("inserted"))
        .when(F.col("_present_n").isNull(), F.lit("deleted"))
        .when(F.size(changed_cols) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_out,
        kind.alias("change_kind"),
        F.when(kind == "changed", changed_cols)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(change_kind, n) — plus zero rows are NOT invented: absent kinds
    simply don't appear (join the CHANGE_KINDS spine if a fixed shape
    is needed)."""
    return diff.groupBy("change_kind").agg(F.count(F.lit(1)).cast("long").alias("n"))
