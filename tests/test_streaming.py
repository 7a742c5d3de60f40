"""Streaming surface tests — finite-prefix assertions via the file source
(one chunk = one micro-batch) and the memory sink, the reference's own
test style (assert_head_eq!/assert_tail_starts_with!, streams/mod.rs:62-77)."""

from __future__ import annotations

import tempfile

import pytest

pytestmark = pytest.mark.slow  # fuzz/streaming/scale tier: pytest -m "not slow" skips
from pyspark.sql import functions as F

from rspl_spark.dsl import compose, eval_sp, filter_sp, map_sp
from rspl_spark.dsl.core import Get, Put
from rspl_spark.streaming import (
    file_stream,
    run_mealy_stream,
    seeded_batch_stream,
    session_agg,
    sliding_agg,
    tumbling_agg,
    write_stream_chunks,
)
from rspl_spark.streaming.sources import run_to_memory_sink


def _chunked_values(spark, chunks, tmp, schema="key string, seq long, value long"):
    dfs = [spark.createDataFrame(rows, schema) for rows in chunks]
    write_stream_chunks(spark, tmp, dfs)
    return file_stream(spark, tmp, schema)


def test_stateless_ops_on_stream(spark):
    """R4/R5 on a streaming DataFrame: same DataFrame ops, no watermark
    needed (late-tail rule: stateless emission is immediate)."""
    with tempfile.TemporaryDirectory() as tmp:
        chunks = [[("k", i, i) for i in range(5)], [("k", i, i) for i in range(5, 10)]]
        stream = _chunked_values(spark, chunks, tmp)
        out = stream.filter(F.col("value") % 2 == 0).select(
            "seq", (F.col("value") * 10).alias("value")
        )
        run_to_memory_sink(out, "t_stateless")
        rows = spark.table("t_stateless").orderBy("seq").collect()
        assert [r["value"] for r in rows] == [0, 20, 40, 60, 80]


def test_mealy_state_survives_microbatches(spark):
    """The pairwise-swap FSM split across micro-batches: an element
    buffered in state at a batch boundary must pair with the first
    element of the NEXT batch (continuation carried in GroupState)."""

    def swap_forever():
        return Get(lambda a: Get(lambda b: Put(b, lambda: Put(a, swap_forever))))

    # 3 then 2 elements: the 3rd is held in state until batch 2 arrives.
    chunks = [[("k", 0, 1), ("k", 1, 2), ("k", 2, 3)], [("k", 3, 4), ("k", 4, 5)]]
    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(spark, chunks, tmp)
        out = run_mealy_stream(stream, swap_forever, "long")
        run_to_memory_sink(out, "t_mealy")
        rows = spark.table("t_mealy").orderBy("seq").collect()
        values = [r["value"] for r in rows]
        assert values == [2, 1, 4, 3]  # pairs (1,2) and (3,4) swapped; 5 pending


def test_mealy_multi_chunk_batch_keeps_seq_order(spark):
    """Arrow splits a key's micro-batch into multiple chunks at
    maxRecordsPerBatch, with NO ordering guarantee between chunks.
    Rows are written evens-first so per-chunk sorting alone would feed
    the FSM [0,2,..,58,1,3,..,59]; the runner must concat + sort once.
    """

    def echo():
        return Get(lambda a: Put(a, echo))

    # One micro-batch, 60 rows, file row-order = evens then odds.
    rows = [("k", s, s) for s in range(0, 60, 2)] + [("k", s, s) for s in range(1, 60, 2)]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        with tempfile.TemporaryDirectory() as tmp:
            stream = _chunked_values(spark, [rows], tmp)
            out = run_mealy_stream(stream, echo, "long")
            run_to_memory_sink(out, "t_chunk_order")
            values = [
                r["value"] for r in spark.table("t_chunk_order").orderBy("seq").collect()
            ]
            assert values == list(range(60))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_mealy_keyed_parallel(spark):
    """Independent FSMs per key — the scale-out model."""
    sp = lambda: compose(filter_sp(lambda v: v % 2 == 0), map_sp(lambda v: v * 100))
    chunks = [
        [("a", 0, 1), ("a", 1, 2), ("b", 0, 4)],
        [("a", 2, 3), ("a", 3, 6), ("b", 1, 5), ("b", 2, 8)],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(spark, chunks, tmp)
        out = run_mealy_stream(stream, sp, "long")
        run_to_memory_sink(out, "t_keyed")
        got = {
            k: [
                r["value"]
                for r in spark.table("t_keyed").filter(F.col("key") == k).orderBy("seq").collect()
            ]
            for k in ("a", "b")
        }
        assert got["a"] == list(eval_sp(sp(), [1, 2, 3, 6]))  # [200, 600]
        assert got["b"] == list(eval_sp(sp(), [4, 5, 8]))  # [400, 800]


from tests.conftest import TWS_AVAILABLE

tws = pytest.mark.skipif(
    not TWS_AVAILABLE,
    reason="transformWithStateInPandas needs google.protobuf (state-server "
    "protocol) and no runtime could be found/vendored on this machine",
)


@tws
def test_mealy_tws_backend_matches(spark):
    """transformWithStateInPandas backend: same pairwise-swap semantics
    across micro-batches as the applyInPandasWithState backend."""
    from rspl_spark.streaming import run_mealy_stream_tws

    def swap_forever():
        return Get(lambda a: Get(lambda b: Put(b, lambda: Put(a, swap_forever))))

    chunks = [[("k", 0, 1), ("k", 1, 2), ("k", 2, 3)], [("k", 3, 4), ("k", 4, 5)]]
    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(spark, chunks, tmp)
        out = run_mealy_stream_tws(stream, swap_forever, "long")
        run_to_memory_sink(out, "t_mealy_tws")
        values = [r["value"] for r in spark.table("t_mealy_tws").orderBy("seq").collect()]
        assert values == [2, 1, 4, 3]


def test_tumbling_window_stream_equals_batch(spark):
    schema = "key string, ts timestamp, value double"
    rows = [
        ("k", f"2024-01-01 00:{m:02d}:00", float(m)) for m in range(0, 30, 3)
    ]
    batch = spark.createDataFrame(rows, "key string, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    aggs = {"n": F.count(F.lit(1)), "total": F.sum("value")}
    expected = {
        (str(r["win_start"]), r["n"], r["total"])
        for r in tumbling_agg(batch, "ts", "10 minutes", aggs).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [batch.limit(5), batch.subtract(batch.limit(5))])
        stream = file_stream(spark, tmp, schema)
        out = tumbling_agg(stream, "ts", "10 minutes", aggs, watermark="5 minutes")
        q = (
            out.writeStream.format("memory")
            .queryName("t_tumbling")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (str(r["win_start"]), r["n"], r["total"])
            for r in spark.table("t_tumbling").collect()
        }
    assert got == expected


def test_sliding_and_session_windows_batch_semantics(spark):
    rows = [
        ("a", "2024-01-01 00:00:00", 1.0),
        ("a", "2024-01-01 00:04:00", 2.0),
        ("a", "2024-01-01 00:20:00", 3.0),
        ("b", "2024-01-01 00:01:00", 5.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts string, value double").select(
        "key", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    slid = sliding_agg(df, "ts", "10 minutes", "5 minutes", {"n": F.count(F.lit(1))}, keys=["key"])
    # events at 0:00 and 0:04 share windows [-5,5) and [0,10)
    a_windows = {
        (str(r["win_start"]), r["n"]) for r in slid.filter(F.col("key") == "a").collect()
    }
    assert ("2024-01-01 00:00:00", 2) in a_windows
    sess = session_agg(df, "ts", "10 minutes", {"n": F.count(F.lit(1))}, keys=["key"])
    sessions = {
        (r["key"], r["n"]) for r in sess.collect()
    }
    # 'a' splits into two sessions (gap > 10min), 'b' has one
    assert sessions == {("a", 2), ("a", 1), ("b", 1)}


def test_seeded_stream_semantics(spark):
    """overeager_receivers.rs:29-32: the seed is the first head and drives
    the first decision (tests/basic.rs:32,47)."""
    seed = spark.createDataFrame([(0, 0)], "seq long, value long")
    rest = spark.createDataFrame([(i, i) for i in range(1, 7)], "seq long, value long")
    stream = seeded_batch_stream(seed, rest)
    from rspl_spark.dsl import bind, alternate, compile_batch
    from rspl_spark.dsl.compiler import CompileError

    sp = bind(
        map_sp(lambda v: v == 0),
        lambda b: map_sp(lambda v: v + 1) if b else map_sp(lambda v: v - 1),
    )
    out = compile_batch(sp, stream)
    vals = [r["value"] for r in out.orderBy("seq").collect()]
    assert vals == [2, 3, 4, 5, 6, 7]  # seed 0 → True branch


def _poll_memory_table(spark, q, name, n_rows, deadline_s=90):
    """Run a continuous-trigger query until the memory sink holds
    n_rows (timers fire between batches), then stop it."""
    import time

    t0 = time.time()
    try:
        while time.time() - t0 < deadline_s:
            if spark.table(name).count() >= n_rows:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    return spark.table(name).orderBy("seq").collect()


@tws
def test_tws_idle_timeout_parity(spark):
    """Per-key timer version of test_fsm_timeout_feedback: key 'a' arms
    on push, then goes idle; the timer (not a later batch of 'a' data)
    must deliver the sentinel and produce walk."""
    from rspl_spark.streaming import run_mealy_stream_tws

    def idle():
        return Get(lambda ev: armed() if ev == 1 else idle())

    def armed():
        return Get(lambda ev: Put(99, idle) if ev == -1 else armed())

    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(spark, [[("a", 0, 1)]], tmp)
        out = run_mealy_stream_tws(stream, idle, "long", timeout_ms=200, timeout_event=-1)
        q = (
            out.writeStream.format("memory")
            .queryName("t_tws_idle")
            .outputMode("append")
            .trigger(processingTime="150 milliseconds")
            .start()
        )
        rows = _poll_memory_table(spark, q, "t_tws_idle", 1)
    assert [r["value"] for r in rows] == [99]


@tws
def test_tws_pelican_capability_timer_parity(spark):
    """Pelican-lite on per-key timers: the FSM's own timeout_after
    capabilities schedule the feedback (examples/pelican.rs:306-308,
    350-367), and the streamed capability sequence must equal the pure
    DSL evaluation of the same term over the same logical events —
    event-exact feedback, not batch-paced."""
    from rspl_spark.dsl.core import run_prefix
    from rspl_spark.streaming import run_mealy_stream_tws

    def _m(*caps_then_state):
        *caps, state = caps_then_state
        sp = state
        for cap in reversed(caps):
            sp = Put(cap, (lambda s: lambda: s)(sp))
        return sp

    def build():
        def on():
            return _m("ped:red", "veh:red", vehicles())

        def vehicles():
            def wait():
                return Get(lambda ev: peds() if ev == "timeout" else wait())

            return _m("veh:green", "timeout_after:250", wait())

        def peds():
            def wait():
                return Get(lambda ev: done() if ev == "timeout" else wait())

            return _m("veh:red", "ped:green", "timeout_after:200", wait())

        def done():
            def loop():
                return Get(lambda _ev: loop())

            return _m("ped:red", loop())

        return on()

    # Pure-DSL reference trace over the same logical event sequence:
    # one external start event, then the two timer deliveries.
    expected = []
    sp = build()
    for ev in ("start", "timeout", "timeout"):
        outs, sp = run_prefix(sp, [ev])
        expected.extend(outs)

    def cap_duration(v):
        s = str(v)
        return int(s.split(":", 1)[1]) if s.startswith("timeout_after:") else None

    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(
            spark, [[("p", 0, "start")]], tmp, schema="key string, seq long, value string"
        )
        out = run_mealy_stream_tws(
            stream,
            build,
            "string",
            timeout_event="timeout",
            timeout_capability=cap_duration,
        )
        q = (
            out.writeStream.format("memory")
            .queryName("t_tws_pelican")
            .outputMode("append")
            .trigger(processingTime="100 milliseconds")
            .start()
        )
        rows = _poll_memory_table(spark, q, "t_tws_pelican", len(expected))
    assert [r["value"] for r in rows] == expected
    # light-safety invariant holds in the streamed trace too
    ped = veh = None
    for v in (r["value"] for r in rows):
        k, _, c = str(v).partition(":")
        if k == "ped":
            ped = c
        elif k == "veh":
            veh = c
        if veh == "green":
            assert ped == "red"
        if ped == "green":
            assert veh == "red"


@tws
def test_tws_list_and_map_state(spark):
    """The remaining transformWithState state-type surface: ListState
    (bounded recent-values buffer) and MapState (per-key distinct
    counts), both surviving micro-batch boundaries. This is the state
    shape of a streaming dedup/profile operator: O(horizon) list + one
    map entry per distinct value, per key."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    from rspl_spark.streaming.tws_runtime import ensure_rocksdb_state_store

    class Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            val = StructType([StructField("v", LongType())])
            self._recent = handle.getListState("recent", val)
            self._counts = handle.getMapState("counts", val, val)

        def handleInputRows(self, key, rows, timerValues):
            batch = pd.concat([pdf for pdf in rows if len(pdf)], ignore_index=True)
            batch = batch.sort_values("seq", kind="mergesort")
            for v in batch["value"]:
                v = int(v)
                self._recent.appendValue((v,))
                prev = self._counts.getValue((v,)) if self._counts.containsKey((v,)) else None
                self._counts.updateValue((v,), ((prev[0] if prev else 0) + 1,))
            # keep only the last 3 in the list state (bounded buffer)
            vals = [t[0] for t in self._recent.get()][-3:]
            self._recent.put([(v,) for v in vals])
            n_distinct = sum(1 for _ in self._counts.iterator())
            yield pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "recent": [",".join(map(str, vals))],
                    "n_distinct": [n_distinct],
                }
            )

        def close(self) -> None:
            pass

    ensure_rocksdb_state_store(spark)
    chunks = [
        [("k", 0, 10), ("k", 1, 20), ("k", 2, 10)],
        [("k", 3, 30), ("k", 4, 20)],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        stream = _chunked_values(spark, chunks, tmp)
        out = stream.groupBy("key").transformWithStateInPandas(
            Profile(),
            outputStructType="key string, recent string, n_distinct long",
            outputMode="append",
            timeMode="none",
        )
        run_to_memory_sink(out, "t_tws_listmap")
        rows = spark.table("t_tws_listmap").collect()
        by_batch = {r["recent"]: r["n_distinct"] for r in rows}
        # batch 1: recent [10,20,10] → "10,20,10", 2 distinct
        # batch 2: list state carried over → last3 of [10,20,10,30,20], 3 distinct
        assert by_batch == {"10,20,10": 2, "10,30,20": 3}


def test_seed_reuse_keyed_on_content_fingerprint(spark):
    """r13 ADVICE fix + r14 hardening: _batch_as_stream reuse is keyed
    on a content fingerprint (schema + rows). Same content reuses the
    committed files (stable part-file names for checkpointed restarts);
    a pre-fingerprint dir with matching content is adopted in place
    without re-minting file names; DIFFERENT content on an explicit
    stable path now RAISES instead of silently overwriting the part
    files a live checkpoint's file-source offsets may reference (r14
    ADVICE: the overwrite deleted exactly the committed files the
    stable-path contract protects)."""
    import glob
    import json
    import os

    import pytest

    from rspl_spark.streaming.sources import _batch_as_stream

    def drain(stream, name):
        q = (
            stream.writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(60)
        return {r["v"] for r in spark.table(name).collect()}

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "seed")
        a = spark.createDataFrame([(1,), (2,)], "v long")
        b = spark.createDataFrame([(7,), (8,)], "v long")
        _batch_as_stream(a, path=path)
        files1 = sorted(glob.glob(os.path.join(path, "*.parquet")))
        # same content -> reuse: identical part-file names
        _batch_as_stream(a, path=path)
        assert sorted(glob.glob(os.path.join(path, "*.parquet"))) == files1
        # committed dir + different seed -> raise, committed files intact
        with pytest.raises(ValueError, match="fingerprint does not match"):
            _batch_as_stream(b, path=path)
        assert sorted(glob.glob(os.path.join(path, "*.parquet"))) == files1
        out = drain(_batch_as_stream(a, path=path), "t_seed_fp_a")
        assert out == {1, 2}
        # pre-fingerprint dir (sidecar missing) with MATCHING content:
        # adopted in place, file names preserved, sidecar re-minted at v2
        side = os.path.join(path, "_rspl_seed_meta.json")
        os.remove(side)
        _batch_as_stream(a, path=path)
        assert sorted(glob.glob(os.path.join(path, "*.parquet"))) == files1
        with open(side) as f:
            assert json.load(f)["v"] == 2
        # pre-fingerprint dir with FOREIGN content -> raise (committed
        # data is never silently deleted)
        os.remove(side)
        with pytest.raises(ValueError, match="Refusing to overwrite"):
            _batch_as_stream(b, path=path)


def test_seed_sidecar_v1_upgraded_in_place(spark):
    """A v1 sidecar (pre-r14: row-repr hash, sensitive to the session
    timezone) is compared with the v1 algorithm and upgraded to the
    tz-stable v2 fingerprint in place on match — no part-file re-mint,
    no spurious mismatch for existing checkpointed deployments."""
    import glob
    import json
    import os

    from rspl_spark.streaming.sources import _batch_as_stream

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "seed")
        a = spark.createDataFrame([(1,), (2,)], "v long")
        _batch_as_stream(a, path=path)
        side = os.path.join(path, "_rspl_seed_meta.json")
        files1 = sorted(glob.glob(os.path.join(path, "*.parquet")))
        # forge the v1 sidecar: same content, v1 (repr-based) hash
        import hashlib

        rows = sorted(repr(tuple(r)) for r in a.collect())
        digest = hashlib.md5(
            (a.schema.simpleString() + "\x00" + "\n".join(rows)).encode()
        ).hexdigest()
        with open(side, "w") as f:
            json.dump(
                {"schema": a.schema.simpleString(), "rows": 2, "hash": digest},
                f,
            )
        _batch_as_stream(a, path=path)  # must match via v1, then upgrade
        assert sorted(glob.glob(os.path.join(path, "*.parquet"))) == files1
        with open(side) as f:
            assert json.load(f)["v"] == 2
