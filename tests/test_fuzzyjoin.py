"""Fuzzy trigram join: brute-force parity on random strings (prefix
filtering is exact — any divergence is a bug), edge cases, and the
no-cartesian plan invariant."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.fuzzyjoin import char_trigrams, fuzzy_self_join


def _tg(s: str) -> set:
    if len(s) < 3:
        return {s}
    return {s[i : i + 3] for i in range(len(s) - 2)}


def _brute(rows, num, den):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            a, b = _tg(sa), _tg(sb)
            inter = len(a & b)
            if inter * den >= num * (len(a) + len(b) - inter):
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_char_trigrams_short_strings(spark):
    df = spark.createDataFrame([("", ), ("ab",), ("abc",), ("abca",)], "s string")
    got = df.select(char_trigrams(F.col("s")).alias("t")).collect()
    assert [sorted(r["t"]) for r in got] == [[""], ["ab"], ["abc"], ["abc", "bca"]]


def test_fuzzy_join_matches_bruteforce_random(spark):
    rng = random.Random(31)
    words = ["alpha", "bravo", "chalk", "delta", "ember", "frost", "gleam"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 4))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for num in (50, 75, 90):
        got = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_self_join(df, "id", "s", num, 100).collect()
        }
        assert got == _brute(rows, num, 100), f"t={num}/100"


def test_fuzzy_join_exact_duplicates_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, None), (4, "xyzzy")],
        "id long, s string",
    )
    got = fuzzy_self_join(df, "id", "s", 100, 100).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in got] == [(1, 2, 1.0)]


def test_fuzzy_join_threshold_boundary_is_inclusive(spark):
    # 'abcd' vs 'abce': grams {abc,bcd} vs {abc,bce} -> J = 1/3 exactly
    df = spark.createDataFrame([(1, "abcd"), (2, "abce")], "id long, s string")
    hit = fuzzy_self_join(df, "id", "s", 1, 3).collect()
    assert len(hit) == 1 and hit[0]["inter"] == 1
    miss = fuzzy_self_join(df, "id", "s", 34, 100).collect()
    assert miss == []


def test_fuzzy_join_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="0 < num <= den"):
        fuzzy_self_join(df, "id", "s", 0)
    with pytest.raises(ValueError, match="0 < num <= den"):
        fuzzy_self_join(df, "id", "s", 101, 100)


def test_fuzzy_join_plan_has_no_cartesian(spark):
    df = spark.createDataFrame([(1, "abc def"), (2, "abc xyz")], "id long, s string")
    plan = fuzzy_self_join(df, "id", "s", 60)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
