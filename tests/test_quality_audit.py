"""Data-quality audit + interval peak-concurrency operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.intervals import peak_concurrency
from rspl_spark.operators.quality import audit


def test_audit_predicate_rules_one_pass_and_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 99.0)], "id long, v double"
    )
    out = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in audit(
            df,
            predicate_rules={
                "v_positive": F.col("v") > 0,          # -3 fails, NULL fails
                "v_small": F.col("v") < 50,            # 99 fails, NULL fails
                "v_not_null": F.col("v").isNotNull(),  # NULL fails
            },
        ).collect()
    }
    assert out == {
        "v_positive": (2, 4),
        "v_small": (2, 4),
        "v_not_null": (1, 4),
    }


def test_audit_unique_rule_counts_surplus_rows_and_skips_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"), (2, "b"), (None, "c"), (None, "c")],
        "k1 long, k2 string",
    )
    out = {
        r["rule"]: (r["n_violations"], r["n_checked"])
        for r in audit(df, {}, unique_rules={"pk": ["k1", "k2"]}).collect()
    }
    # three (1,a) rows -> 2 surplus; NULL-key rows excluded entirely
    assert out == {"pk": (2, 4)}


def test_audit_mixed_rules_and_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    rows = audit(
        df,
        predicate_rules={"s_domain": F.col("s").isin("x", "y")},
        unique_rules={"id_unique": ["id"]},
    ).collect()
    assert {r["rule"] for r in rows} == {"s_domain", "id_unique"}
    assert all(r["n_violations"] == 0 for r in rows)
    with pytest.raises(ValueError, match="no rules"):
        audit(df, {})
    with pytest.raises(ValueError, match="no key columns"):
        audit(df, {}, unique_rules={"bad": []})


def test_peak_concurrency_half_open_and_degenerate_intervals(spark):
    df = spark.createDataFrame(
        [
            (0, 10),
            (5, 15),   # overlaps first -> 2
            (10, 20),  # starts exactly when first ends -> still 2
            (12, 13),  # nested -> 3 during [12,13)
            (30, 30),  # empty: ignored
            (None, 40),  # null: ignored
        ],
        "s long, e long",
    )
    row = peak_concurrency(df, "s", "e").first()
    assert (row["peak"], row["n_intervals"]) == (3, 4)


def test_peak_concurrency_matches_bruteforce_random(spark):
    import random

    rng = random.Random(77)
    ivs = []
    for _ in range(300):
        s = rng.randrange(0, 500)
        ivs.append((s, s + rng.randrange(1, 60)))
    df = spark.createDataFrame(ivs, "s long, e long")
    got = peak_concurrency(df, "s", "e").first()["peak"]
    want = max(
        sum(1 for s, e in ivs if s <= t < e) for t in {s for s, _ in ivs}
    )
    assert got == want


# ---------------------------------------------------------------------------
# table diff
# ---------------------------------------------------------------------------


def test_table_diff_classifies_and_lists_changed_cols(spark):
    from rspl_spark.operators.diff import diff_summary, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 21.0), (3, "c", None), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    d = {r["k"]: r for r in table_diff(old, new, ["k"]).collect()}
    assert d[1]["change_kind"] == "unchanged" and d[1]["changed_cols"] == []
    assert d[2]["change_kind"] == "changed" and d[2]["changed_cols"] == ["s", "v"]
    assert d[3]["change_kind"] == "unchanged"  # NULL == NULL is no change
    assert d[4]["change_kind"] == "deleted"
    assert d[5]["change_kind"] == "inserted"
    summ = {r["change_kind"]: r["n"] for r in diff_summary(
        table_diff(old, new, ["k"])
    ).collect()}
    assert summ == {"unchanged": 2, "changed": 1, "deleted": 1, "inserted": 1}


def test_table_diff_null_to_value_is_change_and_validation(spark):
    import pytest as _pytest

    from rspl_spark.operators.diff import table_diff

    old = spark.createDataFrame([(1, None)], "k long, v double")
    new = spark.createDataFrame([(1, 3.0)], "k long, v double")
    r = table_diff(old, new, ["k"]).first()
    assert r["change_kind"] == "changed" and r["changed_cols"] == ["v"]
    with _pytest.raises(ValueError, match="keys"):
        table_diff(old, new, [])
    with _pytest.raises(ValueError, match="no columns"):
        table_diff(old.select("k"), new.select("k"), ["k"])


def test_audit_rule_names_with_spaces_and_guards(spark):
    df = spark.createDataFrame([(1,)], "id long")
    out = audit(df, {"id is positive-ish": F.col("id") > 0}).collect()
    assert out[0]["rule"] == "id is positive-ish" and out[0]["n_violations"] == 0
    with pytest.raises(ValueError, match="quotes"):
        audit(df, {"bad'name": F.col("id") > 0})


def test_audit_rejects_backslash_and_cr_rule_names(spark):
    # a trailing backslash would escape the generated stack() literal's
    # closing quote; CR reshapes the expr text just like LF
    df = spark.createDataFrame([(1,)], "id long")
    for bad in ("trailing\\", "cr\rname", "nl\nname"):
        with pytest.raises(ValueError, match="must not contain"):
            audit(df, {bad: F.col("id") > 0})
        with pytest.raises(ValueError, match="must not contain"):
            audit(df, {"ok": F.col("id") > 0}, unique_rules={bad: ["id"]})


def test_table_diff_null_keys_compare_instead_of_splitting(spark):
    from rspl_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(None, "x", 1.0), (1, "a", 2.0)], "k int, s string, v double"
    )
    new = spark.createDataFrame(
        [(None, "x", 9.0), (1, "a", 2.0)], "k int, s string, v double"
    )
    rows = table_diff(old, new, ["k"]).collect()
    assert len(rows) == 2  # NOT 3: the NULL key pairs up, no phantom ins+del
    by_k = {r["k"]: r for r in rows}
    assert by_k[None]["change_kind"] == "changed"
    assert by_k[None]["changed_cols"] == ["v"]
    assert by_k[1]["change_kind"] == "unchanged"


def test_table_diff_composite_null_key_and_one_sided_null(spark):
    from rspl_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, None, "a"), (2, "y", "b")], "k1 int, k2 string, v string"
    )
    new = spark.createDataFrame(
        [(1, None, "a"), (3, None, "c")], "k1 int, k2 string, v string"
    )
    rows = table_diff(old, new, ["k1", "k2"]).collect()
    by = {(r["k1"], r["k2"]): r["change_kind"] for r in rows}
    assert by == {
        (1, None): "unchanged",  # composite key with NULL component pairs up
        (2, "y"): "deleted",
        (3, None): "inserted",  # one-sided NULL key still surfaces w/ key intact
    }
