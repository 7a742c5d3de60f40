"""Keyed stateful Mealy-machine template for Structured Streaming.

Runs ANY DSL StreamProcessor term per key across micro-batches: the term's
continuation (a closure tree) is cloudpickled into GroupState between
batches — the direct Spark analog of the reference's event-driven FSM
pattern (tests/events.rs:32-55, states-as-continuations), where the
evaluating thread's blocking ``tail()`` becomes "wait for the next
micro-batch" (SURVEY.md §3 entry point 2).

Scale model: one FSM per key, all keys in parallel; state store holds one
pickled continuation per key (bounded: a term is a finite closure tree).
A single logical stream = one key, correct but serial — the trade rspl's
total order forces (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

import pickle

from collections.abc import Callable, Iterable

from pyspark import cloudpickle

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    StructField,
    StructType,
)

from rspl_spark.dsl.core import StreamProcessor, run_prefix

STATE_SCHEMA = StructType([StructField("sp", BinaryType())])


def run_mealy_stream_tws(
    stream_df: DataFrame,
    sp_factory: Callable[[], StreamProcessor],
    out_type: str,
    key_col: str = "key",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """Same semantics as run_mealy_stream on the MODERN backend
    (transformWithStateInPandas, Spark 4): continuation in a ValueState.

    Both backends exist on purpose: applyInPandasWithState is the widely
    deployed API; transformWithState is where per-key timers and state
    TTLs are headed. The term, semantics and outputs are identical.

    NOTE: requires a working ``google.protobuf`` (the Python worker talks
    to the JVM state server over protobuf) — unavailable in this test
    container, so run_mealy_stream (applyInPandasWithState) is the
    battle-tested default.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = f"`{key_col}` string, `{seq_col}` long, `{value_col}` {out_type}"

    class MealyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "mealy", StructType([StructField("sp", BinaryType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                sp, n_out = pickle.loads(self._state.get()[0])
            else:
                sp, n_out = sp_factory(), 0
            # A key's micro-batch may arrive as SEVERAL Arrow chunks
            # (split at spark.sql.execution.arrow.maxRecordsPerBatch) in
            # no guaranteed order — materialize and sort ONCE so the FSM
            # sees the total seq order the reference semantics require.
            chunks = [pdf for pdf in rows if len(pdf)]
            outs_all = []
            if chunks:
                batch = pd.concat(chunks, ignore_index=True)
                batch = batch.sort_values(seq_col, kind="mergesort")
                outs_all, sp = run_prefix(sp, batch[value_col].tolist())
            self._state.update((cloudpickle.dumps((sp, n_out + len(outs_all))),))
            if outs_all:
                yield pd.DataFrame(
                    {
                        key_col: [str(key[0])] * len(outs_all),
                        seq_col: range(n_out, n_out + len(outs_all)),
                        value_col: outs_all,
                    }
                )

        def close(self) -> None:
            pass

    return stream_df.groupBy(key_col).transformWithStateInPandas(
        MealyProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def run_mealy_stream(
    stream_df: DataFrame,
    sp_factory: Callable[[], StreamProcessor],
    out_type: str,
    key_col: str = "key",
    seq_col: str = "seq",
    value_col: str = "value",
    timeout_ms: int | None = None,
    timeout_event=None,
) -> DataFrame:
    """Apply a fresh ``sp_factory()`` term to each key's sub-stream.

    Input: a streaming (or batch) DataFrame with (key, seq, value).
    Output: (key, seq, value) where seq is the per-key OUTPUT ordinal,
    continuing across micro-batches.

    Feedback loops (the pelican pattern, examples/pelican.rs:306-367):
    the reference re-injects timeout events through a second channel +
    thread; Spark plans are acyclic, so the same behavior comes from
    processing-time state timeouts — pass ``timeout_ms`` and a
    ``timeout_event``: when a key sees no input for the duration, the
    sentinel is fed to its FSM exactly as if it had arrived on the input
    stream, and the timeout re-arms (SURVEY.md §2.1 "Feedback loop").
    """
    out_schema = f"`{key_col}` string, `{seq_col}` long, `{value_col}` {out_type}"
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def proc(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            sp, n_out = pickle.loads(state.get[0])
        else:
            sp, n_out = sp_factory(), 0
        outs_all = []
        if timeout_ms is not None and state.hasTimedOut:
            # Feedback: the armed timeout fires as an input event.
            outs, sp = run_prefix(sp, [timeout_event])
            outs_all.extend(outs)
        else:
            # Arrow delivers a key's micro-batch as multiple chunks
            # (split at arrow maxRecordsPerBatch) with no ordering
            # guarantee BETWEEN chunks — sorting each chunk alone would
            # silently break the total-order contract for keys spanning
            # >1 chunk. Materialize, concat, sort once.
            chunks = [pdf for pdf in pdfs if len(pdf)]
            if chunks:
                batch = pd.concat(chunks, ignore_index=True)
                batch = batch.sort_values(seq_col, kind="mergesort")
                outs_all, sp = run_prefix(sp, batch[value_col].tolist())
        # cloudpickle: continuations are closure trees, stdlib pickle
        # cannot serialize them.
        state.update((cloudpickle.dumps((sp, n_out + len(outs_all))),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if outs_all:
            yield pd.DataFrame(
                {
                    key_col: [str(key[0])] * len(outs_all),
                    seq_col: range(n_out, n_out + len(outs_all)),
                    value_col: outs_all,
                }
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        proc,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
