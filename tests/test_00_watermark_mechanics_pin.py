"""Watermark drop-rule pins — deliberately named test_00_* so pytest's
alphabetical collection runs them FIRST: the q_stream_late_data /
q_session_window_append oracles REPLAY these exact Spark-internal
semantics (queries/streaming_queries.py module docstring — ms-floored
max event time, one-batch late-filter lag, non-strict <= drop,
append-mode emit-on-equality). If a Spark upgrade moves any boundary,
these fail before any gate gates wrong data, and
_require_pinned_watermark_mechanics() refuses unverified versions at
gate runtime (r12 verdict ask #3).

Moved here from tests/test_streaming_extra.py (r13) to promote them to
the front of the suite.
"""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

import pytest

from pyspark.sql import functions as F

from rspl_spark.streaming import file_stream, write_stream_chunks


def test_spark_version_is_pinned_for_watermark_mechanics(spark):
    """The running Spark must be one whose watermark internals these
    pins have verified — the same check the adversarial gates apply."""
    from rspl_spark.queries.streaming_queries import (
        _WATERMARK_MECHANICS_PINNED,
        _require_pinned_watermark_mechanics,
    )

    _require_pinned_watermark_mechanics(spark)  # must not raise here
    mm = ".".join(spark.version.split(".")[:2])
    assert mm in _WATERMARK_MECHANICS_PINNED


def test_all_registered_behaviors_pinned_on_this_spark(spark):
    """r13 verdict ask #7: every Spark-internals replay our gates rely
    on lives in ONE registry (streaming/pins.py), and the running Spark
    is verified for all of them. An unpinned behavior must raise with
    the re-verification recipe, not gate against a stale rule."""
    import pytest

    from rspl_spark.streaming.pins import PINNED_BEHAVIORS, require_pinned

    assert {"watermark-mechanics", "session-window-merge",
            "foreachbatch-batch-identity"} <= set(PINNED_BEHAVIORS)
    for behavior, spec in PINNED_BEHAVIORS.items():
        require_pinned(spark, behavior)  # must not raise on this box
        assert spec["verified_by"], behavior
        assert spec["gates"], behavior

    class _Fake:
        version = "9.9.9"

    with pytest.raises(RuntimeError, match="watermark-mechanics"):
        require_pinned(_Fake(), "watermark-mechanics")


def _run_chunks(spark, chunks, schema, build, mode="append"):
    """Write each rows-list as one mtime-ordered chunk, stream through
    ``build``, drain with availableNow, return the memory table rows."""
    from rspl_spark.streaming.sources import run_to_memory_sink

    name = f"t_wmpin_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(
            spark, tmp, [spark.createDataFrame(rows, schema) for rows in chunks]
        )
        out = build(file_stream(spark, tmp, schema))
        run_to_memory_sink(out, name, timeout_s=180, output_mode=mode)
    return spark.table(name).collect()


def test_watermark_late_filter_lag_floor_and_strictness(spark):
    """Pins the three facts the late-data oracle depends on: (1) the
    late filter in batch N uses the watermark from batches 0..N-2 (one
    behind eviction); (2) the max event time is ms-FLOORED before the
    delay is subtracted; (3) the drop is non-strict (ts == bound drops)."""
    T = dt.datetime(2024, 1, 1, 10, 0, 0)
    M = dt.timedelta(minutes=1)
    US = dt.timedelta(microseconds=1)
    schema = "k string, ts timestamp"
    chunks = [
        [("a", T + 999 * US)],      # max 10:00:00.000999 -> floor 10:00:00.000
        [("b", T + 60 * M)],        # lag absorber: batch 2's bound comes from c0
        [
            # bound for batch 2 = floor_ms(10:00:00.000999) - 10min = 09:50:00.000
            ("drop_below", T - 10 * M - US),        # 09:49:59.999999 <= bound
            ("drop_exact", T - 10 * M),             # == bound: non-strict drop
            ("keep_mid_ms", T - 10 * M + 500 * US),  # above FLOORED bound
            ("keep_above", T - 10 * M + 1000 * US),
        ],
    ]
    got = _run_chunks(
        spark, chunks, schema,
        lambda s: s.withWatermark("ts", "10 minutes").dropDuplicates(["k", "ts"]),
    )
    assert sorted(r["k"] for r in got) == [
        "a", "b", "keep_above", "keep_mid_ms"
    ]


def test_watermark_dedup_late_filter_applies_without_event_time_key(spark):
    """The LATE filter applies whether or not the event-time column is
    in the dedup keys (it is a row-level predicate on the watermarked
    column) — what the key set controls is STATE EVICTION, which needs
    the event-time column among the keys: the reason every dedup gate
    keys on (event_id, ts) is bounded state, not the drop itself."""
    T = dt.datetime(2024, 1, 1, 10, 0, 0)
    H = dt.timedelta(hours=1)
    schema = "k string, ts timestamp"
    chunks = [
        [("a", T)],
        [("b", T + H)],
        [("ancient", T - 50 * H)],  # below batch-3's late bound -> dropped
    ]
    got = _run_chunks(
        spark, chunks, schema,
        lambda s: s.withWatermark("ts", "10 minutes").dropDuplicates(["k"]),
    )
    assert sorted(r["k"] for r in got) == ["a", "b"]


def test_session_append_emits_on_watermark_equality(spark):
    """Append-mode session windows emit a session iff its end <= the
    final eviction watermark — INCLUDING equality (end == watermark is
    closed), and the final no-data batch applies the last chunk's max:
    the q_session_window_append oracle's filter rule."""
    T = dt.datetime(2024, 1, 1, 10, 0, 0)
    M = dt.timedelta(minutes=1)
    schema = "u string, ts timestamp"
    # gap 30m, delay 10m; final max = 11:40 -> final wm = 11:30
    chunks = [
        [("u_exact", T + 60 * M), ("u_open", T + 85 * M)],  # ends 11:30 / 11:55
        [("u_adv", T + 100 * M)],                           # end 12:10
    ]

    def build(s):
        return (
            s.withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "30 minutes"), F.col("u"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select("u", F.col("session_window.end").alias("en"), "n")
        )

    got = _run_chunks(spark, chunks, schema, build)
    assert [(r["u"], str(r["en"])) for r in got] == [
        ("u_exact", "2024-01-01 11:30:00")
    ]
