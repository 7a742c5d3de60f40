"""Derived FSM patterns from the reference's pelican example
(SURVEY.md §2.1 derived-pattern table): hierarchical state machines with
behavioral inheritance, and effects-as-outputs interpreted by a
foreachBatch capability driver."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rspl_spark.dsl.core import Get, Put, eval_sp
from rspl_spark.streaming import file_stream, run_mealy_stream, write_stream_chunks


def test_hierarchical_fsm_behavioral_inheritance():
    """pelican.rs:96-104 (`case_capture_transition!`): a parent handler
    supplies shared transitions; child states shadow only what differs —
    DRY state hierarchies as plain Python function composition (engine-
    side, invisible to Spark, exactly as SURVEY §2.1 prescribes)."""

    def base_transitions(event, self_state, on_reset):
        # shared behavior: 'reset' always returns to the given state
        if event == "reset":
            return Put("resetting", on_reset)
        return None  # not handled → child decides

    def idle():
        def t(ev):
            handled = base_transitions(ev, idle, idle)
            if handled is not None:
                return handled
            if ev == "start":
                return Put("started", running)
            return idle()

        return Get(t)

    def running():
        def t(ev):
            handled = base_transitions(ev, running, idle)  # reset → idle
            if handled is not None:
                return handled
            if ev == "tick":
                return Put("working", running)
            if ev == "stop":
                return Put("stopped", idle)
            return running()

        return Get(t)

    events = ["start", "tick", "tick", "reset", "tick", "start", "stop"]
    out = list(eval_sp(idle(), events))
    # reset handled by inherited transition in `running`; post-reset 'tick'
    # is ignored by idle (no own handler), then start/stop work again.
    assert out == ["started", "working", "working", "resetting", "started", "stopped"]


def test_capability_driver_foreachBatch(spark):
    """pelican.rs:20-26,310-337: effects are reified as output elements
    (capabilities); an external driver interprets them. Spark mapping:
    the FSM emits action rows; a foreachBatch sink interprets the action
    column (SURVEY §2.1 'Effects-as-outputs')."""

    def blinker():
        # every 'toggle' emits a SetLight capability alternating on/off
        def off():
            return Get(lambda ev: Put("light_on", on) if ev == "toggle" else off())

        def on():
            return Get(lambda ev: Put("light_off", off) if ev == "toggle" else on())

        return off()

    effects = []

    def interpret(batch_df, batch_id):
        for r in batch_df.orderBy("key", "seq").collect():
            # the driver-side effect interpreter (pelican's match loop)
            effects.append((r["key"], r["value"]))

    chunks = [
        [("lamp", 0, "toggle"), ("lamp", 1, "noise"), ("lamp", 2, "toggle")],
        [("lamp", 3, "toggle")],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        dfs = [
            spark.createDataFrame(rows, "key string, seq long, value string")
            for rows in chunks
        ]
        write_stream_chunks(spark, tmp, dfs)
        stream = file_stream(spark, tmp, "key string, seq long, value string")
        out = run_mealy_stream(stream, blinker, "string")
        q = (
            out.writeStream.foreachBatch(interpret)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    assert effects == [
        ("lamp", "light_on"),
        ("lamp", "light_off"),
        ("lamp", "light_on"),
    ]
