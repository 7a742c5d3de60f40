"""Streaming ≡ batch parity for the time-series operators: the dense
grid that gapfill_stream/ewma_stream grow incrementally over a chunked
in-order stream must equal the batch gapfill/ewma over the same finite
prefix — the reference's finite-prefix observation discipline
(streams/mod.rs:62-77), the same harness as test_streaming_parity.py.
"""

from __future__ import annotations

import tempfile

import pytest

pytestmark = pytest.mark.slow  # fuzz/streaming/scale tier: pytest -m "not slow" skips
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators.timeseries import ewma, gapfill
from rspl_spark.streaming import (
    ewma_stream,
    file_stream,
    gapfill_stream,
    write_stream_chunks,
)
from rspl_spark.streaming.sources import run_to_memory_sink

SF = "/root/testdata/sf0.001"
_SCHEMA = "user_id long, bts timestamp, v double"


def _bucketed(spark):
    """events → (user_id, 6h bucket, min value): the gates' obs frame."""
    e = load(spark, SF, "events")
    return (
        e.groupBy("user_id", F.window("ts", "6 hours").alias("w"))
        .agg(F.min("value").alias("v"))
        .select("user_id", F.col("w.start").alias("bts"), "v")
    )


def _chunks(spark, obs, n):
    """Split the bucket frame into bts-ordered chunks (in-order arrival)."""
    pdf = obs.orderBy("bts", "user_id").toPandas()
    size = (len(pdf) + n - 1) // n
    schema = obs.schema
    return [
        spark.createDataFrame(pdf.iloc[i : i + size], schema)
        for i in range(0, len(pdf), size)
    ]


def test_round6_matches_spark_half_up_on_midpoints(spark):
    """r11 advice fix: the streaming folds' final round must replicate
    Spark's F.round (HALF_UP on the shortest decimal repr), not
    Python's builtin half-even round — they diverge on exact 6dp
    midpoints (Java BigDecimal.valueOf(2.0000005).setScale(6, HALF_UP)
    → 2.000001; builtin round can give 2.0)."""
    from rspl_spark.streaming.timeseries import _round6

    probes = [
        2.0000005, 1.0000015, -2.0000005, 0.1234565, -0.1234575,
        7.0 / 3.0, 1e-7, -1e-7, 0.0, 123456.7890145, 2.675e-4,
    ]
    rows = spark.createDataFrame(
        [(x,) for x in probes], "x double"
    ).select(F.round("x", 6).alias("r")).collect()
    for x, r in zip(probes, rows):
        assert _round6(x) == r["r"], f"divergence at {x!r}"


def test_gapfill_stream_matches_batch_locf(spark):
    obs = _bucketed(spark)
    expected = {
        (str(r["user_id"]), str(r["bts"]), r["v"], r["is_gap"])
        for r in gapfill(obs, ["user_id"], "bts", "6 HOURS", {"v": "locf"}).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, _chunks(spark, obs, 4))
        stream = file_stream(spark, tmp, _SCHEMA)
        out = gapfill_stream(stream, "user_id", "bts", "6 hours", {"v": "locf"})
        run_to_memory_sink(out, "t_gapfill_parity", timeout_s=180)
        got = {
            (r["user_id"], str(r["bts"]), r["v"], r["is_gap"])
            for r in spark.table("t_gapfill_parity").collect()
        }
    assert got == expected
    assert len(got) > obs.count()  # gaps actually exist in the data


def test_gapfill_stream_cross_batch_gap_and_late_drop(spark):
    """A gap spanning a micro-batch boundary fills exactly once, and a
    late (≤ frontier) arrival is dropped, not re-emitted."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)

    def chunk(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1] * len(rows),
                    "bts": [t0 + dt.timedelta(hours=h) for h, _ in rows],
                    "v": [v for _, v in rows],
                }
            ),
            _SCHEMA,
        )

    chunks = [
        chunk([(0, 10.0)]),
        chunk([(18, 40.0), (6, 99.0)]),  # 2-bucket gap + in-batch order fix
        chunk([(12, 77.0)]),  # LATE: behind the frontier → dropped
        chunk([(24, 50.0)]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        stream = file_stream(spark, tmp, _SCHEMA)
        out = gapfill_stream(stream, "user_id", "bts", "6 hours", {"v": "locf"})
        run_to_memory_sink(out, "t_gapfill_late", timeout_s=180)
        rows = sorted(
            (r["bts"], r["v"], r["is_gap"])
            for r in spark.table("t_gapfill_late").collect()
        )
    hours = [(int((t - t0).total_seconds() // 3600), v, g) for t, v, g in rows]
    assert hours == [
        (0, 10.0, False),
        (6, 99.0, False),  # arrived out of order INSIDE a batch: sorted in
        (12, 99.0, True),  # the late 12h row was dropped; gap filled by LOCF
        (18, 40.0, False),
        (24, 50.0, False),
    ]


def test_gapfill_stream_zero_and_null_fills(spark):
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    c = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1],
                "bts": [t0, t0 + dt.timedelta(hours=12)],
                "v": [5.0, 7.0],
            }
        ),
        _SCHEMA,
    )
    for method, want in (("zero", 0.0), ("null", None)):
        with tempfile.TemporaryDirectory() as tmp:
            write_stream_chunks(spark, tmp, [c])
            stream = file_stream(spark, tmp, _SCHEMA)
            out = gapfill_stream(stream, "user_id", "bts", "6 hours", {"v": method})
            run_to_memory_sink(out, f"t_gapfill_{method}", timeout_s=180)
            gap = [
                r["v"]
                for r in spark.table(f"t_gapfill_{method}").collect()
                if r["is_gap"]
            ]
        assert gap == [want]


def test_gapfill_stream_rejects_linear(spark):
    obs = _bucketed(spark)
    with pytest.raises(ValueError, match="not streamable"):
        gapfill_stream(obs, "user_id", "bts", "6 hours", {"v": "linear"})
    with pytest.raises(ValueError, match="no fill columns"):
        gapfill_stream(obs, "user_id", "bts", "6 hours", {})


def test_ewma_stream_matches_batch_bit_exact(spark):
    """Final streamed EWMA per (key, bucket) == batch ewma — EXACT
    equality (same IEEE fold), not approximate."""
    obs = _bucketed(spark)
    expected = {
        (str(r["user_id"]), str(r["bts"])): r["ewma"]
        for r in ewma(obs, ["user_id"], "bts", "v", window=16).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, _chunks(spark, obs, 4))
        stream = file_stream(spark, tmp, _SCHEMA)
        out = ewma_stream(stream, "user_id", "bts", "v", window=16)
        run_to_memory_sink(out, "t_ewma_parity", timeout_s=180)
        got = {
            (r["user_id"], str(r["bts"])): r["ewma"]
            for r in spark.table("t_ewma_parity").collect()
        }
    assert got == expected  # bit-exact, every row


def test_ewma_stream_window_truncation_across_batches(spark):
    """The state tail truncates to `window` across micro-batch
    boundaries (not within one batch only)."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)

    def chunk(pairs):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1] * len(pairs),
                    "bts": [t0 + dt.timedelta(hours=6 * i) for i, _ in pairs],
                    "v": [v for _, v in pairs],
                }
            ),
            _SCHEMA,
        )

    chunks = [chunk([(0, 0.0), (1, 1.0)]), chunk([(2, 2.0)]), chunk([(3, 3.0)])]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        stream = file_stream(spark, tmp, _SCHEMA)
        out = ewma_stream(stream, "user_id", "bts", "v", window=2)
        run_to_memory_sink(out, "t_ewma_trunc", timeout_s=180)
        got = {str(r["bts"]): r["ewma"] for r in spark.table("t_ewma_trunc").collect()}
    # window=2 → ewma = (prev + 2·cur)/3 from the 2nd row on
    assert got[str(t0 + dt.timedelta(hours=12))] == round((1.0 + 2 * 2.0) / 3, 6)
    assert got[str(t0 + dt.timedelta(hours=18))] == round((2.0 + 2 * 3.0) / 3, 6)


def test_ewma_stream_validates_window(spark):
    obs = _bucketed(spark)
    with pytest.raises(ValueError, match="window"):
        ewma_stream(obs, "user_id", "bts", "v", window=0)


def test_rolling_median_stream_matches_batch(spark):
    """Streamed trailing-7 median per (key, bucket) == batch
    rolling_median (Spark exact percentile) on the same prefix."""
    from rspl_spark.operators.timeseries import rolling_median
    from rspl_spark.streaming import rolling_median_stream

    obs = _bucketed(spark)
    expected = {
        (str(r["user_id"]), str(r["bts"])): r["rmedian"]
        for r in rolling_median(obs, ["user_id"], "bts", "v", n_buckets=7).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, _chunks(spark, obs, 4))
        stream = file_stream(spark, tmp, _SCHEMA)
        out = rolling_median_stream(stream, "user_id", "bts", "v", n_buckets=7)
        run_to_memory_sink(out, "t_rmed_parity", timeout_s=180)
        got = {
            (r["user_id"], str(r["bts"])): r["rmedian"]
            for r in spark.table("t_rmed_parity").collect()
        }
    assert got == expected


def test_rolling_median_stream_tail_truncates_across_batches(spark):
    import datetime as dt

    import pandas as pd

    from rspl_spark.streaming import rolling_median_stream

    t0 = dt.datetime(2024, 1, 1)

    def chunk(pairs):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [1] * len(pairs),
                    "bts": [t0 + dt.timedelta(hours=6 * i) for i, _ in pairs],
                    "v": [v for _, v in pairs],
                }
            ),
            _SCHEMA,
        )

    chunks = [chunk([(0, 10.0), (1, 2.0)]), chunk([(2, 8.0), (3, 100.0)])]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        stream = file_stream(spark, tmp, _SCHEMA)
        out = rolling_median_stream(stream, "user_id", "bts", "v", n_buckets=2)
        run_to_memory_sink(out, "t_rmed_trunc", timeout_s=180)
        got = {str(r["bts"]): r["rmedian"] for r in spark.table("t_rmed_trunc").collect()}
    # window=2: median = midpoint of the last two values
    assert got[str(t0 + dt.timedelta(hours=12))] == 5.0   # (2, 8)
    assert got[str(t0 + dt.timedelta(hours=18))] == 54.0  # (8, 100)


def test_ewma_and_rmedian_stream_null_slots_match_batch(spark):
    """r10 review fix: a NULL value occupies a frame SLOT (the batch
    ROWS-frame semantics) — with window=2, a NULL between v1 and v2
    must evict v1 from v2's window in BOTH engines. Streaming == batch
    exactly, including the NULL rows."""
    import datetime as dt

    import pandas as pd

    from rspl_spark.operators.timeseries import ewma, rolling_median
    from rspl_spark.streaming import ewma_stream, rolling_median_stream

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user_id": [1] * 5,
            "bts": [t0 + dt.timedelta(hours=6 * i) for i in range(5)],
            "v": [2.0, 8.0, None, 4.0, None],
        }
    )
    obs = spark.createDataFrame(pdf, _SCHEMA)
    exp_ewma = {
        str(r["bts"]): r["ewma"]
        for r in ewma(obs, ["user_id"], "bts", "v", window=2).collect()
    }
    exp_med = {
        str(r["bts"]): r["rmedian"]
        for r in rolling_median(obs, ["user_id"], "bts", "v", n_buckets=2).collect()
    }
    # batch sanity: the NULL slot evicted 8.0 from row 3's window
    assert exp_ewma[str(t0 + dt.timedelta(hours=18))] == 4.0
    assert exp_med[str(t0 + dt.timedelta(hours=18))] == 4.0
    chunks = [
        spark.createDataFrame(pdf.iloc[:2], _SCHEMA),
        spark.createDataFrame(pdf.iloc[2:], _SCHEMA),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        e_out = ewma_stream(
            file_stream(spark, tmp, _SCHEMA), "user_id", "bts", "v", window=2
        )
        run_to_memory_sink(e_out, "t_ewma_nulls", timeout_s=180)
        got_e = {
            str(r["bts"]): r["ewma"] for r in spark.table("t_ewma_nulls").collect()
        }
        m_out = rolling_median_stream(
            file_stream(spark, tmp, _SCHEMA), "user_id", "bts", "v", n_buckets=2
        )
        run_to_memory_sink(m_out, "t_rmed_nulls", timeout_s=180)
        got_m = {
            str(r["bts"]): r["rmedian"]
            for r in spark.table("t_rmed_nulls").collect()
        }
    assert got_e == exp_ewma
    assert got_m == exp_med


def test_gapfill_stream_max_gap_guard_and_nat_drop(spark):
    """r10 review fix: a too-wide gap raises instead of emitting an
    unbounded row run, and a NULL timestamp is dropped rather than
    poisoning the frontier with int64 min."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    pdf = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "bts": [pd.NaT, t0, t0 + dt.timedelta(hours=60)],  # 10-bucket gap
            "v": [9.0, 1.0, 2.0],
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [spark.createDataFrame(pdf, _SCHEMA)])
        guarded = gapfill_stream(
            file_stream(spark, tmp, _SCHEMA),
            "user_id", "bts", "6 hours", {"v": "locf"}, max_gap_buckets=5,
        )
        with pytest.raises(Exception, match="max_gap_buckets"):
            run_to_memory_sink(guarded, "t_gap_guard", timeout_s=180)
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [spark.createDataFrame(pdf, _SCHEMA)])
        ok = gapfill_stream(
            file_stream(spark, tmp, _SCHEMA),
            "user_id", "bts", "6 hours", {"v": "locf"}, max_gap_buckets=10,
        )
        run_to_memory_sink(ok, "t_gap_ok", timeout_s=180)
        rows = spark.table("t_gap_ok").collect()
    assert len(rows) == 11  # NaT row dropped; dense 11-bucket grid
    assert all(r["bts"] is not None for r in rows)


def test_transition_pairs_stream_crosses_batch_boundaries(spark):
    """The last state carried in keyed state must pair with the next
    micro-batch's first event; NULL states reset the chain exactly like
    the batch lag + prev-not-null filter."""
    import datetime as dt

    import pandas as pd

    from rspl_spark.streaming import transition_pairs_stream

    t0 = dt.datetime(2024, 1, 1)
    schema = "user_id long, ts timestamp, event_type string, event_id long"

    def chunk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "event_id"]),
            schema,
        )

    h = dt.timedelta(hours=1)
    chunks = [
        chunk([(1, t0, "a", 1), (1, t0 + h, "b", 2)]),
        chunk([(1, t0 + 2 * h, "c", 3), (1, t0 + 3 * h, None, 4)]),
        chunk([(1, t0 + 4 * h, "d", 5)]),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        out = transition_pairs_stream(
            file_stream(spark, tmp, schema),
            "user_id", "ts", "event_type", tiebreak_cols=["event_id"],
        )
        run_to_memory_sink(out, "t_trans_cross", timeout_s=180)
        got = sorted(
            (r["prev_state"], r["state"])
            for r in spark.table("t_trans_cross").collect()
        )
    # b->c spans the first batch boundary; the NULL state is dropped so
    # its neighbors become adjacent: c->d ALSO spans a boundary (r12
    # review fix — previously c->NULL emitted and NULL->d vanished,
    # the asymmetry the batch operator now also rejects)
    assert got == [("a", "b"), ("b", "c"), ("c", "d")]


def test_transition_pairs_stream_frontier_ties_and_redelivery(spark):
    """The stored (ts, tiebreak) position orders frontier-timestamp ties
    across micro-batches: exact re-delivery of an already-seen row is
    deduped, an out-of-order tie BEHIND the stored tiebreak drops, and
    a tie AHEAD of it processes — batch parity without the caller
    contract."""
    import datetime as dt

    import pandas as pd

    from rspl_spark.streaming import transition_pairs_stream

    t0 = dt.datetime(2024, 1, 1)
    t1 = t0 + dt.timedelta(hours=1)
    schema = "user_id long, ts timestamp, event_type string, event_id long"

    def chunk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts", "event_type", "event_id"]),
            schema,
        )

    chunks = [
        chunk([(1, t0, "a", 1), (1, t1, "b", 2)]),
        chunk(
            [
                (1, t1, "b", 2),   # exact re-delivery -> deduped
                (1, t1, "x", 1),   # tie behind stored tiebreak -> dropped
                (1, t1, "c", 3),   # tie ahead of stored tiebreak -> pairs
            ]
        ),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, chunks)
        out = transition_pairs_stream(
            file_stream(spark, tmp, schema),
            "user_id", "ts", "event_type", tiebreak_cols=["event_id"],
        )
        run_to_memory_sink(out, "t_trans_tie", timeout_s=180)
        got = sorted(
            (r["prev_state"], r["state"])
            for r in spark.table("t_trans_tie").collect()
        )
    assert got == [("a", "b"), ("b", "c")]


def test_transition_pairs_stream_rejects_unsupported_tiebreak_type(spark):
    import pytest

    from rspl_spark.streaming import transition_pairs_stream

    df = spark.createDataFrame(
        [(1, None, "a", [1])],
        "user_id long, ts timestamp, event_type string, arr array<long>",
    )
    with pytest.raises(ValueError, match="unsupported type"):
        transition_pairs_stream(
            df, "user_id", "ts", "event_type", tiebreak_cols=["arr"]
        )


def test_gapfill_stream_null_only_first_batch(spark):
    """Review fix: a key whose FIRST micro-batch holds only NULL
    timestamps must leave its state ABSENT — storing (None, None) made
    the next batch crash on list(None) — and then gapfill normally."""
    import datetime as dt

    import pandas as pd

    t0 = dt.datetime(2024, 1, 1)
    c0 = pd.DataFrame(
        {"user_id": [1, 1], "bts": [pd.NaT, pd.NaT], "v": [9.0, 8.0]}
    )
    c1 = pd.DataFrame(
        {
            "user_id": [1, 1],
            "bts": [t0, t0 + dt.timedelta(hours=12)],
            "v": [1.0, 2.0],
        }
    )
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(
            spark,
            tmp,
            [spark.createDataFrame(c0, _SCHEMA), spark.createDataFrame(c1, _SCHEMA)],
        )
        out = gapfill_stream(
            file_stream(spark, tmp, _SCHEMA),
            "user_id", "bts", "6 hours", {"v": "locf"},
        )
        run_to_memory_sink(out, "t_gap_natfirst", timeout_s=180)
        rows = spark.table("t_gap_natfirst").orderBy("bts").collect()
    assert [r["v"] for r in rows] == [1.0, 1.0, 2.0]  # 0h, 6h locf gap, 12h
    assert [bool(r["is_gap"]) for r in rows] == [False, True, False]
