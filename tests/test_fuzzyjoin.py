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


# ---------------------------------------------------------------------------
# edit-distance join
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_positional_trigrams_tag_occurrences(spark):
    from rspl_spark.operators.fuzzyjoin import positional_trigrams

    df = spark.createDataFrame([("ababa",)], "s string")
    got = df.select(positional_trigrams(F.col("s")).alias("t")).first()["t"]
    assert got == ["aba#0", "bab#0", "aba#1"]


def test_edit_join_matches_bruteforce_random(spark):
    from rspl_spark.operators.fuzzyjoin import edit_distance_self_join

    rng = random.Random(47)
    alphabet = "abcdef"
    seeds = ["".join(rng.choice(alphabet) for _ in range(rng.randint(10, 16))) for _ in range(25)]
    rows = []
    for i in range(140):
        s = list(rng.choice(seeds))
        for _ in range(rng.randint(0, 3)):  # sprinkle edits around seeds
            op = rng.choice("ins del sub".split())
            p = rng.randrange(len(s))
            if op == "ins":
                s.insert(p, rng.choice(alphabet))
            elif op == "del" and len(s) > 4:
                del s[p]
            else:
                s[p] = rng.choice(alphabet)
        rows.append((i, "".join(s)))
    df = spark.createDataFrame(rows, "id long, s string")
    for k in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_self_join(df, "id", "s", k).collect()
        }
        want = {
            (ia, ib, _lev(sa, sb))
            for idx, (ia, sa) in enumerate(rows)
            for ib, sb in rows[idx + 1 :]
            if _lev(sa, sb) <= k
        }
        assert got == want, f"k={k}"


def test_edit_join_short_string_path_is_exact(spark):
    from rspl_spark.operators.fuzzyjoin import edit_distance_self_join

    # 'ab' vs 'cd': distance 2, ZERO shared grams — only the short path finds it
    df = spark.createDataFrame(
        [(1, "ab"), (2, "cd"), (3, "abcdefghijkl"), (4, "abodefghijkl")],
        "id long, s string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_self_join(df, "id", "s", 2).collect()
    }
    assert got[(1, 2)] == 2      # short-vs-short, gramless
    assert got[(3, 4)] == 1      # long path
    assert (1, 3) not in got     # length gap > k
    with pytest.raises(ValueError, match="max_short_rows"):
        edit_distance_self_join(df, "id", "s", 2, max_short_rows=1)


def test_edit_join_validation(spark):
    from rspl_spark.operators.fuzzyjoin import edit_distance_self_join

    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        edit_distance_self_join(df, "id", "s", 0)


def test_fuzzy_join_q6_matches_bruteforce(spark):
    # q-gram size is a scale knob (trigram vocab saturates on big
    # corpora); exactness must hold for any q
    def tg6(s):
        return {s[i : i + 6] for i in range(max(len(s) - 5, 1))} if len(s) >= 6 else {s}

    rng = random.Random(53)
    rows = [
        (i, "".join(rng.choice("abcdefgh") for _ in range(rng.randint(8, 20))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_join(df, "id", "s", 30, 100, q=6).collect()
    }
    want = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            a, b = tg6(sa), tg6(sb)
            inter = len(a & b)
            if inter * 100 >= 30 * (len(a) + len(b) - inter):
                want.add((ia, ib))
    assert got == want


def test_gram_frequency_stats_guides_q_choice(spark):
    from rspl_spark.operators.fuzzyjoin import gram_frequency_stats

    # templated strings: tiny trigram vocab, much richer 8-gram vocab
    rows = [(i, f"prefix-{i % 7}-suffix-{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, s string")
    s3 = gram_frequency_stats(df, "s", 3).first()
    s8 = gram_frequency_stats(df, "s", 8).first()
    assert s3["n_rows"] == s8["n_rows"] == 200
    assert s8["n_distinct_grams"] > s3["n_distinct_grams"]
    assert s8["avg_gram_count"] < s3["avg_gram_count"]
    # occurrences are per-row DISTINCT grams (matching the join's sets)
    assert s3["n_gram_occurrences"] == sum(len(_tg(s)) for _, s in rows)


def test_fuzzy_join_two_tables_matches_bruteforce(spark):
    from rspl_spark.operators.fuzzyjoin import fuzzy_join

    rng = random.Random(61)
    words = ["north", "south", "river", "stone", "cloud", "ember"]
    mk = lambda n, off: [
        (off + i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 3))))
        for i in range(n)
    ]
    lrows, rrows = mk(70, 0), mk(55, 1000)
    left = spark.createDataFrame(lrows, "id long, s string")
    right = spark.createDataFrame(rrows, "id long, s string")
    got = {
        (r["id_l"], r["id_r"])
        for r in fuzzy_join(left, right, "id", "id", "s", 60, 100).collect()
    }
    want = set()
    for ia, sa in lrows:
        for ib, sb in rrows:
            a, b = _tg(sa), _tg(sb)
            inter = len(a & b)
            if inter * 100 >= 60 * (len(a) + len(b) - inter):
                want.add((ia, ib))
    assert got == want and len(want) > 0


def test_fuzzy_join_two_tables_identical_string_cross_pair(spark):
    from rspl_spark.operators.fuzzyjoin import fuzzy_join

    left = spark.createDataFrame([(1, "same text")], "id long, s string")
    right = spark.createDataFrame([(9, "same text"), (10, None)], "id long, s string")
    got = fuzzy_join(left, right, "id", "id", "s", 100, 100).collect()
    assert [(r["id_l"], r["id_r"], r["jaccard"]) for r in got] == [(1, 9, 1.0)]


def test_choose_q_grows_until_vocab_outpaces_corpus(spark):
    from rspl_spark.operators.fuzzyjoin import choose_q

    # templated strings: the trigram vocabulary is tiny (avg count high),
    # longer grams individualize -> choose_q must move past 3
    rows = [(i, f"prefix-{i % 7}-suffix-{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, s string")
    q = choose_q(df, "s")
    assert q > 3
    # genuinely diverse strings: trigrams already rare, q stays at base
    rng = random.Random(17)
    alpha = "abcdefghijklmnopqrstuvwxyz"
    diverse = [
        (i, "".join(rng.choice(alpha) for _ in range(30))) for i in range(50)
    ]
    assert choose_q(spark.createDataFrame(diverse, "id long, s string"), "s") == 3


def test_fuzzy_self_join_auto_q_matches_bruteforce_at_chosen_q(spark):
    from rspl_spark.operators.fuzzyjoin import choose_q

    def _qg(s, q):
        return {s[i : i + q] for i in range(len(s) - q + 1)} if len(s) >= q else {s}

    rng = random.Random(47)
    words = ["alpha", "bravo", "chalk", "delta", "ember", "frost", "gleam"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(2, 5))))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    q = choose_q(df, "s")
    got = {
        (r["id_a"], r["id_b"])
        for r in fuzzy_self_join(df, "id", "s", 60, 100, q="auto").collect()
    }
    want = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            a, b = _qg(sa, q), _qg(sb, q)
            inter = len(a & b)
            if inter * 100 >= 60 * (len(a) + len(b) - inter):
                want.add((min(ia, ib), max(ia, ib)))
    assert got == want


def test_bad_q_rejected_fast(spark):
    import pytest

    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, s string")
    for bad in ("Auto", "3", 0, -1, 2.5, True):
        with pytest.raises(ValueError, match="q="):
            fuzzy_self_join(df, "id", "s", 60, 100, q=bad)
    from rspl_spark.operators.fuzzyjoin import fuzzy_join

    with pytest.raises(ValueError, match="q="):
        fuzzy_join(df, df, "id", "id", "s", 60, 100, q="AUTO")


def test_choose_q_sampled_path_matches_saturated_decision(spark):
    # a saturated tiny-alphabet corpus must force q past base both with
    # and without the sampling path; sample_rows=10 exercises the
    # sampled branch on a small frame deterministically
    import random

    from rspl_spark.operators.fuzzyjoin import choose_q

    rng = random.Random(3)
    rows = [
        (i, "".join(rng.choice("ab") for _ in range(24))) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    full = choose_q(df, "s")
    sampled = choose_q(df, "s", sample_rows=10)
    assert full > 3
    # the sampled estimate extrapolates conservatively: never smaller
    assert sampled >= full
