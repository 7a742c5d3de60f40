"""Unit tests for the corpus-curation operators (operators/curation.py):
chunking invariants, deterministic sampling, quantile cuts, scrubbing.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Row, functions as F

from rspl_spark.operators import curation as C
from rspl_spark.operators.text import quality_expr


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, **r) for i, r in enumerate(rows)])


# ---------------------------------------------------------------------------
# chunk_tokens
# ---------------------------------------------------------------------------


def test_chunk_covers_every_token_exactly_under_nonoverlap(spark):
    # stride == window → a partition: concatenating chunks restores the doc.
    df = _docs(spark, [{"text": " ".join(f"t{i}" for i in range(10))}])
    out = C.chunk_tokens(df, window=4, stride=4).orderBy("chunk_idx").collect()
    assert [r.chunk_idx for r in out] == [0, 1, 2]
    assert " ".join(r.chunk_text for r in out) == " ".join(f"t{i}" for i in range(10))
    assert [r.n_chunk_tokens for r in out] == [4, 4, 2]


def test_chunk_overlap_width(spark):
    # stride < window → consecutive chunks share window-stride tokens.
    df = _docs(spark, [{"text": " ".join(f"t{i}" for i in range(8))}])
    out = C.chunk_tokens(df, window=4, stride=2).orderBy("chunk_idx").collect()
    for a, b in zip(out, out[1:]):
        ta, tb = a.chunk_text.split(), b.chunk_text.split()
        assert ta[2:] == tb[: len(ta) - 2]


def test_chunk_short_doc_yields_one_chunk(spark):
    df = _docs(spark, [{"text": "only three tokens"}])
    out = C.chunk_tokens(df, window=64, stride=48).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 3


def test_chunk_rejects_bad_params(spark):
    df = _docs(spark, [{"text": "x"}])
    with pytest.raises(ValueError):
        C.chunk_tokens(df, window=0, stride=4)
    with pytest.raises(ValueError):
        C.chunk_tokens(df, window=4, stride=0)


# ---------------------------------------------------------------------------
# mix_sources / stratified_sample — determinism and rate behavior
# ---------------------------------------------------------------------------


def test_mix_rate_zero_and_one(spark):
    df = _docs(spark, [{"text": "x", "source": s} for s in ["a"] * 50 + ["b"] * 50])
    out = C.mix_sources(df, {"a": 1.0, "b": 0.0}, default_rate=0.5)
    srcs = [r.source for r in out.collect()]
    assert srcs.count("a") == 50 and srcs.count("b") == 0


def test_mix_is_deterministic_across_runs(spark):
    df = _docs(spark, [{"text": "x", "source": "a"} for _ in range(200)])
    kept1 = sorted(r.doc_id for r in C.mix_sources(df, {}, 0.25).collect())
    kept2 = sorted(r.doc_id for r in C.mix_sources(df, {}, 0.25).collect())
    assert kept1 == kept2
    # rate ~respected (hash-uniform, generous band)
    assert 20 <= len(kept1) <= 80


def test_mix_rejects_negative_rate(spark):
    df = _docs(spark, [{"text": "x", "source": "a"}])
    with pytest.raises(ValueError):
        C.mix_sources(df, {"a": -0.5}, 0.5)
    # weights > 1 are now the UPSAMPLING path (round 3), not an error:
    # the output gains a copy_idx column
    assert "copy_idx" in C.mix_sources(df, {"a": 1.5}, 0.5).columns


def test_stratified_sample_exact_k_per_stratum(spark):
    df = _docs(
        spark,
        [{"text": "x", "lang": lang} for lang in ["en"] * 30 + ["de"] * 30 + ["fr"] * 2],
    )
    out = C.stratified_sample(df, "lang", 5).groupBy("lang").count().collect()
    counts = {r.lang: r["count"] for r in out}
    # strata smaller than k survive whole
    assert counts == {"en": 5, "de": 5, "fr": 2}


# ---------------------------------------------------------------------------
# quality_quantile_cut
# ---------------------------------------------------------------------------


def test_quantile_cut_keeps_top_half_per_group(spark):
    rows = [
        {"text": " ".join(["w%d" % i for i in range(n)]), "lang": lang}
        for lang in ("en", "de")
        for n in (5, 10, 20, 40, 60)
    ]
    df = _docs(spark, rows)
    out = C.quality_quantile_cut(df, quality_expr(), "lang", keep_frac=0.5)
    per_lang = out.groupBy("lang").count().collect()
    # median cut with >= keeps ceil(n/2) = 3 of 5 per group
    assert all(r["count"] == 3 for r in per_lang)
    # every kept score >= every dropped score within its group
    kept = {(r.lang, r.doc_id) for r in out.collect()}
    scored = df.withColumn("s", quality_expr()).collect()
    for lang in ("en", "de"):
        ks = [r.s for r in scored if (r.lang, r.doc_id) in kept and r.lang == lang]
        ds = [r.s for r in scored if (r.lang, r.doc_id) not in kept and r.lang == lang]
        assert min(ks) >= max(ds)


# ---------------------------------------------------------------------------
# scrub_text
# ---------------------------------------------------------------------------


def test_scrub_redacts_and_counts(spark):
    df = _docs(
        spark,
        [
            {"text": "mail me at a.b+c@foo.co or x@y.io  thanks"},
            {"text": "docs: https://ex.org/a?b=1 and http://t.co/xyz"},
            {"text": "card 1234567890 pin 12345"},
            {"text": "clean   text    here"},
        ],
    )
    out = {r.doc_id: r for r in C.scrub_text(df).collect()}
    assert out[0].clean_text == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[0].n_emails == 2
    assert out[1].clean_text == "docs: <URL> and <URL>"
    assert out[1].n_urls == 2
    # only runs of >= 6 digits are masked
    assert out[2].clean_text == "card <NUM> pin 12345"
    assert out[3].clean_text == "clean text here"


def test_weighted_sample_topk_properties(spark):
    """Exact size k; dominant weights always included, vanishing weights
    never; the selection compiles to TakeOrderedAndProject (per-partition
    heaps, not a global sort)."""
    from pyspark.sql import functions as F

    from rspl_spark.operators.curation import weighted_sample_topk

    rows = [(i, 1.0) for i in range(100)]
    rows[7] = (7, 1e12)   # must win a slot: key = ln(u)/1e12 ~ 0-
    rows[13] = (13, 1e-9)  # must lose: key = ln(u)/1e-9 << everyone
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample_topk(df, F.col("w"), k=10, id_col="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert len(ids) == 10
    assert 7 in ids
    assert 13 not in ids
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # zero/negative weights are excluded, not crashed on
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 2.0)], "doc_id long, w double")
    got = weighted_sample_topk(df2, F.col("w"), k=5, id_col="doc_id").collect()
    assert {r["doc_id"] for r in got} == {3}


def test_thin_hot_keys_ultra_hot_key_survives(spark):
    """ADVICE r6: when a key's count exceeds cap * SAMPLE_MOD the raw
    keep-ratio floors to 0 and would delete the bot key outright; the
    GREATEST(keep, 1) guard thins it to ~n / SAMPLE_MOD rows instead.
    Simulated by shrinking SAMPLE_MOD so the regime is reachable."""
    import rspl_spark.operators.curation as C

    df = spark.createDataFrame(
        [("bot", i) for i in range(500)] + [("ok", 0)],
        "user_id string, event_id long",
    )
    old = C.SAMPLE_MOD
    C.SAMPLE_MOD = 100  # cap * MOD = 100 < 500 bot rows -> raw keep = 0
    try:
        out = C.thin_hot_keys(df, "user_id", 1, id_col="event_id")
        by_key = {
            r["user_id"]: r["n"]
            for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
    finally:
        C.SAMPLE_MOD = old
    assert by_key.get("ok") == 1  # healthy key untouched
    # ultra-hot key survives (≈ n/SAMPLE_MOD = 5 expected, > 0 required)
    assert 0 < by_key.get("bot", 0) < 500


def test_pii_scrub_redacts_and_counts(spark):
    from rspl_spark.operators.curation import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and 192.168.0.1 then 555-000-1111 done"),
            (2, "no pii here at all"),
            (3, "two mails x@y.io z@w.co one ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == "mail [EMAIL] and [IP] then [PHONE] done"
    assert (out[1]["n_email"], out[1]["n_ip"], out[1]["n_phone"]) == (1, 1, 1)
    assert out[1]["n_redactions"] == 3
    assert out[2]["clean_text"] == "no pii here at all"
    assert out[2]["n_redactions"] == 0
    assert out[3]["n_email"] == 2 and out[3]["n_ip"] == 1
    assert "[EMAIL]" in out[3]["clean_text"] and "@" not in out[3]["clean_text"]


def test_pii_scrub_null_text_contract(spark):
    """NULL text is treated as '': clean_text = '' with every count 0
    — never NULL clean_text or negative counts (F.size(NULL) is -1)."""
    from rspl_spark.operators.curation import pii_scrub

    df = spark.createDataFrame(
        [(1, None), (2, "mail x@y.io now")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["clean_text"] == ""
    assert out[1]["n_email"] == 0 and out[1]["n_ip"] == 0 and out[1]["n_phone"] == 0
    assert out[1]["n_redactions"] == 0
    assert out[2]["clean_text"] == "mail [EMAIL] now"


def test_luhn_validated_cc_scrub(spark):
    """The cc pattern redacts ONLY Luhn-valid digit runs: known-valid
    test numbers go, a one-digit-off run and sub-window digit runs
    survive byte-intact, repeated valid numbers count per occurrence."""
    from rspl_spark.operators.curation import CC_PATTERN, pii_scrub

    df = spark.createDataFrame(
        [
            (1, "pay 4532015112830366 now"),        # valid (Visa test)
            (2, "ref 4532015112830367 now"),        # invalid check digit
            (3, "short 123456789012 id"),           # 12 digits: no candidate
            (4, "two 4532015112830366 and 5425233430109903 ok"),  # both valid
            (5, "dup 4532015112830366 4532015112830366 dup"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df, patterns=(CC_PATTERN,)).collect()}
    assert out[1]["clean_text"] == "pay [CC] now" and out[1]["n_cc"] == 1
    assert out[2]["clean_text"] == "ref 4532015112830367 now" and out[2]["n_cc"] == 0
    assert out[3]["clean_text"] == "short 123456789012 id"
    assert out[4]["clean_text"] == "two [CC] and [CC] ok" and out[4]["n_cc"] == 2
    assert out[5]["clean_text"] == "dup [CC] [CC] dup" and out[5]["n_cc"] == 2
    assert out[6]["clean_text"] == "" and out[6]["n_redactions"] == 0


def test_luhn_valid_expression(spark):
    """luhn_valid agrees with a reference Python Luhn over a spread of
    digit runs (both parities of length, leading zeros)."""
    from pyspark.sql import functions as F

    from rspl_spark.operators.curation import luhn_valid

    def ref(s):
        total = 0
        for i, ch in enumerate(reversed(s), start=1):
            d = int(ch)
            total += (d * 2 - 9) if (i % 2 == 0 and d > 4) else (d * 2 if i % 2 == 0 else d)
        return total % 10 == 0

    runs = [
        "4532015112830366", "5425233430109903", "79927398713",
        "0000000000000", "0000000000001", "1234567812345670",
        "123456781234567", "4532015112830367",
    ]
    df = spark.createDataFrame([(s,) for s in runs], "s string")
    got = {r["s"]: r["ok"] for r in df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()}
    for s in runs:
        assert got[s] == ref(s), s


# ---------------------------------------------------------------------------
# winsorize (rank-based, per group)
# ---------------------------------------------------------------------------


def test_winsorize_matches_numpy_rank_definition(spark):
    import numpy as np

    from rspl_spark.operators.curation import winsorize

    rng = np.random.default_rng(41)
    vals = np.round(rng.lognormal(2, 1, 400), 3)
    rows = [(("g1" if i % 2 else "g0"), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], 10, 100, keep_bounds=True).collect()
    for g in ("g0", "g1"):
        sample = np.sort(vals[1::2] if g == "g1" else vals[0::2])
        n = len(sample)
        klo = -(-n * 10 // 100)  # ceil
        lo, hi = sample[klo - 1], sample[n - klo]
        got = [r for r in out if r["g"] == g]
        assert all(r["bound_lo"] == lo and r["bound_hi"] == hi for r in got)
        for r in got:
            assert r["clipped"] == min(max(r["v"], lo), hi)
            assert r["clip_lo"] == int(r["v"] < lo)
            assert r["clip_hi"] == int(r["v"] > hi)


def test_winsorize_nulls_and_tiny_groups_and_validation(spark):
    import pytest as _pytest

    from rspl_spark.operators.curation import winsorize

    df = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("b", 7.0)], "g string, v double"
    )
    out = {(r["g"], r["v"]): r for r in winsorize(df, "v", ["g"], 5).collect()}
    # singleton group: both bounds are the single value — identity clip
    assert out[("b", 7.0)]["clipped"] == 7.0
    assert out[("a", 5.0)]["clipped"] == 5.0
    nr = out[("a", None)]
    assert nr["clipped"] is None and nr["clip_lo"] == 0 and nr["clip_hi"] == 0
    with _pytest.raises(ValueError, match="alpha"):
        winsorize(df, "v", ["g"], 50, 100)
    with _pytest.raises(ValueError, match="group column"):
        winsorize(df, "v", [], 5)


# ------------------------------------------------------- consolidate_records


def test_consolidate_records_survivorship(spark):
    """Golden record: most-complete first (when enabled), NULLs
    backfilled by the first non-null in priority order; all-null
    columns stay NULL; single-record keys pass through."""
    from rspl_spark.operators.curation import consolidate_records

    rows = [
        # key a: r3 newest but sparse; r2 most complete -> wins with
        # completeness_first, its NULL email backfilled from r1
        ("a", 1, "x@old", None, 1.0),
        ("a", 2, None, "Ann", 2.0),
        ("a", 3, None, None, None),
        # key b: single record
        ("b", 9, None, "Bob", None),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts long, email string, name string, score double"
    )
    got = {
        r["k"]: (r["email"], r["name"], r["score"])
        for r in consolidate_records(
            df, ["k"], priority=[("ts", "desc")],
            value_cols=["email", "name", "score"], completeness_first=True,
        ).collect()
    }
    assert got["a"] == ("x@old", "Ann", 2.0)
    assert got["b"] == (None, "Bob", None)
    # without completeness: newest wins, fields backfilled downward
    got2 = {
        r["k"]: (r["email"], r["name"], r["score"])
        for r in consolidate_records(
            df, ["k"], priority=[("ts", "desc")],
            value_cols=["email", "name", "score"],
        ).collect()
    }
    assert got2["a"] == ("x@old", "Ann", 2.0)  # r3 wins, all backfilled


def test_consolidate_records_validation_and_plan(spark):
    import pytest

    from rspl_spark.operators.curation import consolidate_records

    df = spark.createDataFrame([("a", 1, "v")], "k string, ts long, v string")
    with pytest.raises(ValueError, match="priority"):
        consolidate_records(df, ["k"], priority=[])
    with pytest.raises(ValueError, match="direction"):
        consolidate_records(df, ["k"], priority=[("ts", "down")])
    with pytest.raises(ValueError, match="no value columns"):
        consolidate_records(df.select("k"), ["k"], priority=[("k", "asc")])
    # scale shape: one Exchange (the key shuffle), no Join
    out = consolidate_records(
        spark.range(100).select(
            (F.col("id") % 10).alias("k"), F.col("id").alias("ts"),
            F.col("id").cast("string").alias("v"),
        ),
        ["k"], priority=[("ts", "desc")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Exchange") <= 2  # key shuffle (+AQE read)
    assert "Join" not in plan


# ------------------------------------------------------------------ cdf_match


def test_cdf_match_rank_alignment(spark):
    """Two sources with shifted scales calibrate onto the reference:
    equal within-group ranks get equal calibrated scores; order within
    each group is preserved; NULLs are dropped."""
    import pytest

    from rspl_spark.operators.curation import cdf_match

    rows = (
        [("a", float(v)) for v in (1, 2, 3, 4)]
        + [("b", float(v)) for v in (100, 200, 300, 400)]
        + [("b", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = cdf_match(df, ["g"], "v", n_grid=100).collect()
    assert len(out) == 8  # NULL dropped
    cal = {(r["g"], r["v"]): r["calibrated"] for r in out}
    # same within-group rank -> same calibrated value, across sources
    assert cal[("a", 1.0)] == cal[("b", 100.0)]
    assert cal[("a", 4.0)] == cal[("b", 400.0)]
    # order preserved within each group
    a_sorted = [cal[("a", float(v))] for v in (1, 2, 3, 4)]
    assert a_sorted == sorted(a_sorted)
    # top rank hits the pooled max, bottom the pooled min
    assert cal[("a", 4.0)] == 400.0
    assert cal[("a", 1.0)] == 1.0
    with pytest.raises(ValueError, match="n_grid"):
        cdf_match(df, ["g"], "v", n_grid=0)
    # rank_col == out_col would silently overwrite the rank — reject
    with pytest.raises(ValueError, match="rank_col and out_col"):
        cdf_match(df, ["g"], "v", rank_col="score", out_col="score")


def test_cdf_match_external_reference_and_singleton(spark):
    from rspl_spark.operators.curation import cdf_match

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 6.0), ("solo", 42.0)], "g string, v double"
    )
    ref = spark.createDataFrame(
        [(float(v),) for v in range(0, 101)], "v double"
    )
    cal = {
        (r["g"], r["v"]): r["calibrated"]
        for r in cdf_match(df, ["g"], "v", n_grid=10, reference_df=ref).collect()
    }
    assert cal[("a", 5.0)] == 0.0    # bottom rank -> reference min
    assert cal[("a", 6.0)] == 100.0  # top rank -> reference max
    assert cal[("solo", 42.0)] == 0.0  # single-row group: percent_rank 0


def test_cdf_match_empty_reference_raises(spark):
    import pytest

    from rspl_spark.operators.curation import cdf_match

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    empty_ref = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError, match="reference"):
        cdf_match(df, ["g"], "v", reference_df=empty_ref)


def test_group_split_leakage_free_and_weights(spark):
    """Every group lands in exactly ONE split; custom weights respected;
    invalid weights raise. Pure projection: no Exchange in the plan."""
    import pytest

    from rspl_spark.operators.curation import group_split

    df = spark.createDataFrame(
        [(u, i) for u in range(200) for i in range(3)], "u long, i long"
    )
    out = group_split(df, "u")
    per_user = out.groupBy("u").agg(F.countDistinct("split").alias("ns"))
    assert per_user.agg(F.max("ns")).collect()[0][0] == 1  # no straddling
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    two = group_split(df, "u", weights={"a": 50, "b": 50})
    assert {r["split"] for r in two.select("split").distinct().collect()} == {"a", "b"}
    with pytest.raises(ValueError, match="sum"):
        group_split(df, "u", weights={"a": 50, "b": 49})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]


def test_group_split_null_key_yields_null_split(spark):
    """A NULL group key cannot be assigned leakage-free — the row gets
    an explicit NULL split (docstring contract), it does not silently
    land in some bucket."""
    from rspl_spark.operators.curation import group_split

    df = spark.createDataFrame(
        [("u1", 1), (None, 2), ("u2", 3)], "u string, i long"
    )
    out = group_split(df, "u").collect()
    assert len(out) == 3  # no rows vanish
    by_key = {r["i"]: r["split"] for r in out}
    assert by_key[2] is None
    assert by_key[1] is not None and by_key[3] is not None


def test_cdf_match_rejects_output_column_collision(spark):
    """Pre-existing pct_rank/out_col columns raise instead of being
    silently clobbered; rank_col renames the rank output."""
    import pytest

    from rspl_spark.operators.curation import cdf_match

    df = spark.createDataFrame(
        [("a", 1.0, 9.0), ("a", 2.0, 9.0)], "g string, v double, pct_rank double"
    )
    with pytest.raises(ValueError, match="pct_rank"):
        cdf_match(df, ["g"], "v")
    out = cdf_match(df, ["g"], "v", rank_col="v_rank")
    assert "v_rank" in out.columns and out.count() == 2
    df2 = spark.createDataFrame([("a", 1.0)], "g string, calibrated double")
    with pytest.raises(ValueError, match="calibrated"):
        cdf_match(df2, ["g"], "g")


# ---------------------------------------------------------------------------
# review fixes: NULL/dirty-data robustness


def test_thin_hot_keys_thins_null_keys(spark):
    """Review fix: a NULL-keyed flood must be thinned like any hot key
    (the USING join could never match NULL, so it passed untouched)."""
    rows = [Row(user_id=None, doc_id=i) for i in range(20)] + [
        Row(user_id=1, doc_id=100 + i) for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    out = C.thin_hot_keys(df, "user_id", max_rows_per_key=2, id_col="doc_id")
    by_key = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_key.get(1, 0) < 20
    assert by_key.get(None, 0) < 20  # NULL key thinned too


def test_temperature_weights_excludes_null_sources(spark):
    """Review fix: a NULL source row must not crash the driver-side
    sorted(); NULL sources are excluded from the weight computation."""
    df = spark.createDataFrame(
        [Row(source="a", doc_id=0), Row(source=None, doc_id=1),
         Row(source="a", doc_id=2), Row(source="b", doc_id=3)]
    )
    w = C.temperature_weights(df, 0.5)
    assert set(w) == {"a", "b"}
    with pytest.raises(ValueError, match="no non-NULL sources"):
        C.temperature_weights(df.filter(F.col("source").isNull()), 0.5)


def test_quality_quantile_cut_rejects_existing_score_column(spark):
    """Review fix: a pre-existing 'score' column would silently
    duplicate (AMBIGUOUS_REFERENCE downstream); raise instead."""
    df = spark.createDataFrame(
        [Row(doc_id=0, grp="a", score=1.0), Row(doc_id=1, grp="a", score=2.0)]
    )
    with pytest.raises(ValueError, match="'score' column"):
        C.quality_quantile_cut(df, F.col("score") * 1.0, "grp", 0.5)


def test_winsorize_clips_null_group(spark):
    """Review fix: NULL is a group — its bounds must join back
    (eqNullSafe) so outliers clip and the flags are 0/1, not NULL."""
    rows = [Row(g=None, v=float(x)) for x in [1, 2, 3, 4, 100]] + [
        Row(g="a", v=float(x)) for x in [1, 2, 3, 4, 100]
    ]
    out = C.winsorize(
        spark.createDataFrame(rows), "v", ["g"], alpha_num=1, alpha_den=4
    ).collect()
    for grp in (None, "a"):
        vals = sorted(r["clipped"] for r in out if r["g"] == grp)
        assert vals[-1] < 100.0  # outlier clipped in BOTH groups
        flags = {r["clip_hi"] for r in out if r["g"] == grp}
        assert flags <= {0, 1} and 1 in flags


def test_chunk_tokens_null_text_like_empty(spark):
    """Review fix: NULL text chunks like empty text (one empty chunk),
    never a NULL chunk_text / NULL n_chunk_tokens garbage row."""
    df = spark.createDataFrame([Row(doc_id=1, text=None), Row(doc_id=2, text="")])
    rows = C.chunk_tokens(df).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["chunk_text"] is not None
        assert r["n_chunk_tokens"] is not None


def test_scrub_text_email_inside_url_counts_once(spark):
    """Review fix: an email embedded in a URL increments n_emails only
    (URL count runs on the email-scrubbed text) — one span, one redaction
    family per counter."""
    df = spark.createDataFrame(
        [Row(doc_id=1, text="see https://user@example.com/x now")]
    )
    r = C.scrub_text(df).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_urls"] == 1  # the (rewritten) URL still counts as a URL
    df2 = spark.createDataFrame([Row(doc_id=1, text="mail user@example.com")])
    r2 = C.scrub_text(df2).collect()[0]
    assert (r2["n_emails"], r2["n_urls"]) == (1, 0)
