"""SCD Type-2 operator: change capture, interval stitching, merge
semantics the oracle gate can't exercise (late arrivals, same-ts
collisions, no-op batches), and the merge ≡ rebuild property on random
histories."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from rspl_spark.operators.scd import scd2_build, scd2_merge, scd2_snapshot

SCHEMA = "k string, attr string, ts long, seq long"


def _rows(df):
    cols = ["k", "attr", "valid_from", "valid_to", "version", "is_current"]
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _build(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return scd2_build(df, ["k"], ["attr"], "ts", order_cols=["seq"])


def test_build_collapses_unchanged_and_stitches_intervals(spark):
    rows = [
        ("a", "x", 1, 1),
        ("a", "x", 2, 2),  # unchanged -> collapsed
        ("a", "y", 3, 3),
        ("a", "x", 5, 4),  # back to x -> NEW version (type 2, not a merge)
        ("b", "z", 7, 5),
    ]
    out = {(r["k"], r["version"]): r for r in _build(spark, rows).collect()}
    assert len(out) == 4
    a1, a2, a3 = out[("a", 1)], out[("a", 2)], out[("a", 3)]
    assert (a1["attr"], a1["valid_from"], a1["valid_to"]) == ("x", 1, 3)
    assert (a2["attr"], a2["valid_from"], a2["valid_to"]) == ("y", 3, 5)
    assert (a3["attr"], a3["valid_from"], a3["valid_to"]) == ("x", 5, None)
    assert a3["is_current"] and not a1["is_current"] and not a2["is_current"]
    assert out[("b", 1)]["is_current"]


def test_build_same_ts_highest_seq_wins_and_null_attrs(spark):
    rows = [("a", "x", 1, 1), ("a", "y", 1, 9), ("a", None, 2, 1), ("a", None, 3, 2)]
    out = sorted(_build(spark, rows).collect(), key=lambda r: r["version"])
    assert [r["attr"] for r in out] == ["y", None]  # seq 9 wins; NULL==NULL collapses
    assert out[1]["valid_from"] == 2 and out[1]["valid_to"] is None


def test_merge_late_arrival_restitches_history(spark):
    # dim knows ts 1 (x) and 10 (z); a LATE snapshot at ts 5 (y) arrives
    dim = _build(spark, [("a", "x", 1, 1), ("a", "z", 10, 2)])
    batch = spark.createDataFrame([("a", "y", 5, 3)], SCHEMA)
    out = sorted(
        scd2_merge(dim, batch, ["k"], ["attr"], "ts", order_cols=["seq"]).collect(),
        key=lambda r: r["version"],
    )
    assert [(r["attr"], r["valid_from"], r["valid_to"]) for r in out] == [
        ("x", 1, 5),
        ("y", 5, 10),
        ("z", 10, None),
    ]


def test_merge_same_ts_batch_row_wins(spark):
    dim = _build(spark, [("a", "x", 1, 1)])
    batch = spark.createDataFrame([("a", "y", 1, 0)], SCHEMA)
    out = scd2_merge(dim, batch, ["k"], ["attr"], "ts", order_cols=["seq"]).collect()
    assert len(out) == 1 and out[0]["attr"] == "y"


def test_merge_noop_batch_and_untouched_passthrough(spark):
    dim = _build(spark, [("a", "x", 1, 1), ("b", "y", 2, 2)])
    # batch re-observes a's current state later -> no new version for a;
    # b is untouched and must pass through bit-identically
    batch = spark.createDataFrame([("a", "x", 9, 3)], SCHEMA)
    out = scd2_merge(dim, batch, ["k"], ["attr"], "ts", order_cols=["seq"])
    assert _rows(out) == _rows(dim)


def test_merge_new_key_insert(spark):
    dim = _build(spark, [("a", "x", 1, 1)])
    batch = spark.createDataFrame([("c", "w", 4, 1)], SCHEMA)
    out = {r["k"]: r for r in scd2_merge(
        dim, batch, ["k"], ["attr"], "ts", order_cols=["seq"]
    ).collect()}
    assert out["c"]["version"] == 1 and out["c"]["is_current"]
    assert out["a"]["attr"] == "x"


def test_merge_equals_rebuild_on_random_histories(spark):
    rng = random.Random(23)
    hist = [
        (f"k{rng.randrange(6)}", rng.choice("abc"), rng.randrange(50), i)
        for i in range(120)
    ]
    full = _build(spark, hist)
    for cut in (10, 25, 40):
        before = [r for r in hist if r[2] <= cut]
        after = [r for r in hist if r[2] > cut]
        if not before or not after:
            continue
        dim = _build(spark, before)
        batch = spark.createDataFrame(after, SCHEMA)
        merged = scd2_merge(dim, batch, ["k"], ["attr"], "ts", order_cols=["seq"])
        assert _rows(merged) == _rows(full), f"cut={cut}"


def test_snapshot_at_instant(spark):
    dim = _build(spark, [("a", "x", 1, 1), ("a", "y", 5, 2), ("b", "z", 8, 3)])
    at4 = {(r["k"], r["attr"]) for r in scd2_snapshot(dim, 4).collect()}
    assert at4 == {("a", "x")}  # b not yet created, a still version 1
    at9 = {(r["k"], r["attr"]) for r in scd2_snapshot(dim, 9).collect()}
    assert at9 == {("a", "y"), ("b", "z")}


def test_build_validation(spark):
    df = spark.createDataFrame([("a", "x", 1, 1)], SCHEMA)
    with pytest.raises(ValueError, match="non-empty"):
        scd2_build(df, [], ["attr"], "ts")
    with pytest.raises(ValueError, match="non-empty"):
        scd2_build(df, ["k"], [], "ts")


def test_scd2_interval_invariants_on_events(spark):
    """Structural laws any SCD2 dimension must satisfy, checked on the
    real events build: per key, versions are 1..n dense, intervals are
    CONTIGUOUS (valid_to == next valid_from — no gaps, no overlaps),
    exactly one current row, and consecutive versions differ in the
    tracked attribute (no no-op versions survive change capture)."""
    from pyspark.sql import functions as F

    from rspl_spark.catalog import load

    e = load(spark, "/root/testdata/sf0.001", "events")
    dim = scd2_build(e, ["user_id"], ["event_type"], "ts", order_cols=["event_id"])
    rows = sorted(
        ((r["user_id"], r["version"], r["event_type"], r["valid_from"], r["valid_to"],
          r["is_current"]) for r in dim.collect())
    )
    assert rows
    by_key = {}
    for k, ver, attr, vf, vt, cur in rows:
        by_key.setdefault(k, []).append((ver, attr, vf, vt, cur))
    for k, vs in by_key.items():
        assert [v[0] for v in vs] == list(range(1, len(vs) + 1)), k
        assert sum(1 for v in vs if v[4]) == 1 and vs[-1][4], k
        for (v1, a1, f1, t1, _), (v2, a2, f2, t2, _) in zip(vs, vs[1:]):
            assert t1 == f2, (k, v1)      # contiguous, no gap/overlap
            assert a1 != a2, (k, v1)      # change capture collapsed no-ops
        assert vs[-1][3] is None


def test_merge_lossiness_documented_behaviors(spark):
    """Review finding pinned as DOCUMENTED behavior (the dimension is
    lossy; see scd2_merge's docstring): (1) a late row inserted before
    a COLLAPSED unchanged snapshot cannot re-create the flip the
    dropped snapshot would have caused; (2) stored versions carry no
    order values, so across separate merges a same-ts batch row always
    wins regardless of order_cols. Neither equals the full-raw-history
    build — the event-log rebuild is the backstop."""
    # (1) collapsed snapshot: H1 = {A@1, A@3} -> one stored version
    dim = _build(spark, [("a", "A", 1, 1), ("a", "A", 3, 2)])
    assert len(dim.collect()) == 1
    late = spark.createDataFrame([("a", "B", 2, 3)], SCHEMA)
    merged = scd2_merge(dim, late, ["k"], ["attr"], "ts", order_cols=["seq"])
    cur = [r["attr"] for r in merged.filter("is_current").collect()]
    assert cur == ["B"]  # version-history result (full build would end on A)
    full = _build(spark, [("a", "A", 1, 1), ("a", "A", 3, 2), ("a", "B", 2, 3)])
    assert [r["attr"] for r in full.filter("is_current").collect()] == ["A"]

    # (2) same-ts across merges: batch wins though its seq is LOWER
    dim2 = _build(spark, [("b", "A", 1, 100)])
    b2 = spark.createDataFrame([("b", "B", 1, 50)], SCHEMA)
    m2 = scd2_merge(dim2, b2, ["k"], ["attr"], "ts", order_cols=["seq"])
    assert [r["attr"] for r in m2.collect()] == ["B"]  # upsert semantics
    full2 = _build(spark, [("b", "A", 1, 100), ("b", "B", 1, 50)])
    assert [r["attr"] for r in full2.collect()] == ["A"]  # seq 100 wins
