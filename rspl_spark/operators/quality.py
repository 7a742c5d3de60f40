"""Data-quality audit: declared expectations evaluated in one pass.

A pipeline that feeds a 100 TB training run needs its input contracts
checked continuously — value ranges, set membership, null policies,
key uniqueness — and the check must not cost another full pass per
rule. ``audit`` folds every predicate rule into ONE aggregate over one
scan (a row per rule comes out of an unpivot of that single row);
uniqueness rules are each one partial-agg distinct count (n − #distinct
keys = number of surplus rows). Violations are counts, not samples —
the shape that feeds an alerting threshold; pair with a filter on the
same predicates to quarantine offenders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def audit(
    df: DataFrame,
    predicate_rules: dict[str, Column],
    unique_rules: dict[str, list[str]] | None = None,
) -> DataFrame:
    """One row per rule: (rule, n_violations, n_checked).

    ``predicate_rules`` map rule name → a Column that is True when the
    row PASSES; NULL predicate results count as violations (an
    unevaluable expectation is a failed one — document exceptions by
    coalescing in the rule itself). All predicate rules share one scan.

    ``unique_rules`` map rule name → key column list; violations =
    rows beyond the first per duplicate key group (exact, via one
    count-distinct aggregate). Rows with a NULL in any key column are
    EXCLUDED from the uniqueness check (n_checked drops too) — pair
    with a not-null predicate rule to police those.
    """
    if not predicate_rules and not unique_rules:
        raise ValueError("audit: no rules given")
    for name in list(predicate_rules) + list(unique_rules or {}):
        # the name reaches a generated stack() expr both as a
        # single-quoted SQL string literal and as a backticked
        # identifier — quotes/backticks break quoting directly, a
        # backslash escapes the literal's closing quote, and CR/LF
        # reshape the expr text
        if any(c in name for c in ("'", "`", "\\", "\n", "\r")):
            raise ValueError(
                f"audit: rule name {name!r} must not contain quotes, "
                "backticks, backslashes, or newlines"
            )
    parts = []
    if predicate_rules:
        aggs = [F.count(F.lit(1)).alias("_n")]
        for name, pred in predicate_rules.items():
            aggs.append(
                F.sum(
                    F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
                ).alias(f"_v_{name}")
            )
        one = df.agg(*aggs)
        # backtick-quote the staged columns: rule names are free text
        # (spaces, dashes) and reach the stack() expr as identifiers
        stack_args = ", ".join(
            f"'{name}', `_v_{name}`" for name in predicate_rules
        )
        parts.append(
            one.select(
                F.expr(
                    f"stack({len(predicate_rules)}, {stack_args}) AS (rule, n_violations)"
                ),
                F.col("_n").alias("n_checked"),
            ).select("rule", "n_violations", "n_checked")
        )
    for name, keys in (unique_rules or {}).items():
        if not keys:
            raise ValueError(f"audit: unique rule {name!r} has no key columns")
        nn = df
        for k in keys:
            nn = nn.filter(F.col(k).isNotNull())
        parts.append(
            nn.agg(
                F.count(F.lit(1)).alias("_n"),
                F.count_distinct(*[F.col(k) for k in keys]).alias("_d"),
            ).select(
                F.lit(name).alias("rule"),
                (F.col("_n") - F.col("_d")).cast("long").alias("n_violations"),
                F.col("_n").cast("long").alias("n_checked"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.col("n_checked").cast("long").alias("n_checked"),
    )
