"""Fluent user-facing stream API — the ergonomic entry point a user of
the reference switches to.

    from rspl_spark.api import stream_of

    out = (stream_of(df, value_col="value")
           .filter(lambda v: v > 0)
           .map(lambda v: v * 2)
           .to_df())              # compiled if possible, else interpreted

The pipeline records an rspl term (compose of combinators, reference
semantics exactly); ``to_df`` tries the Catalyst compiler first and falls
back to the keyed applyInPandas interpreter for stateful terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rspl_spark.dsl.combinators import (
    MapSP,
    alternate as _alternate,
    bind as _bind,
    compose,
    filter_sp,
    map_sp,
)
from rspl_spark.dsl.compiler import CompileError, compile_batch, with_dense_ordinal
from rspl_spark.dsl.core import StreamProcessor
from rspl_spark.dsl.interpreter import interpret_batch


class RStream:
    """A (seq, value) DataFrame plus a pending rspl term."""

    def __init__(
        self,
        df: DataFrame,
        value_col: str = "value",
        seq_col: str = "seq",
        key_col: str | None = None,
        _term: StreamProcessor | None = None,
        dense_input: bool = False,
    ):
        self._df = df
        self._value_col = value_col
        self._seq_col = seq_col
        self._key_col = key_col
        self._term = _term
        self._dense_input = dense_input

    def _with(self, sp: StreamProcessor) -> "RStream":
        term = sp if self._term is None else compose(self._term, sp)
        return RStream(
            self._df,
            self._value_col,
            self._seq_col,
            self._key_col,
            term,
            dense_input=self._dense_input,
        )

    def map(self, fn, expr_fn=None, py_fn=None) -> "RStream":
        return self._with(map_sp(fn, expr_fn=expr_fn, py_fn=py_fn))

    def filter(self, pred, expr_fn=None, py_fn=None) -> "RStream":
        return self._with(filter_sp(pred, expr_fn=expr_fn, py_fn=py_fn))

    def then(self, sp: StreamProcessor) -> "RStream":
        """Append an arbitrary term (FSM, alternate, multi-Get window…)."""
        return self._with(sp)

    def alternate_with(self, sp: StreamProcessor) -> "RStream":
        term = self._term if self._term is not None else map_sp(lambda x: x)
        return RStream(
            self._df,
            self._value_col,
            self._seq_col,
            self._key_col,
            _alternate(term, sp),
            dense_input=self._dense_input,
        )

    def bind(self, f) -> "RStream":
        term = self._term if self._term is not None else map_sp(lambda x: x)
        return RStream(
            self._df,
            self._value_col,
            self._seq_col,
            self._key_col,
            _bind(term, f),
            dense_input=self._dense_input,
        )

    def to_df(self, out_type: str | None = None, dense_seq: bool = True) -> DataFrame:
        """Execute: compiled (native Catalyst plan) when the term allows,
        otherwise interpreted (``out_type`` required for that path).

        Seq contract (unified across both paths): the output ``seq`` is a
        DENSE per-stream output ordinal starting at 0 — the interpreter
        numbers outputs that way natively; the compiled path renumbers
        with :func:`with_dense_ordinal` (parallel range partitioning, NOT
        a single-task global window) only when the term can actually
        leave gaps. Length-preserving terms over a dense input (pure map
        chains, alternate-of-maps from ``to_stream_df``/``generate``
        sources) skip the renumber entirely. Pass ``dense_seq=False`` to
        keep raw source ordinals."""
        if self._term is None:
            return self._df
        if self._key_col is None:
            try:
                out = compile_batch(
                    self._term,
                    self._df,
                    self._value_col,
                    self._seq_col,
                    dense_seq=self._dense_input,
                )
                if dense_seq and not (self._dense_input and _length_preserving(self._term)):
                    out = (
                        with_dense_ordinal(out, self._seq_col, "_dense")
                        .drop(self._seq_col)
                        .withColumnRenamed("_dense", self._seq_col)
                        .select(self._seq_col, self._value_col)
                    )
                return out
            except CompileError:
                pass
            except Exception:
                # A one-lambda term whose function is Python-only blows
                # up when applied to a Column (TypeError/ValueError, not
                # CompileError). If the caller supplied out_type they
                # explicitly sanctioned the interpreter — fall back;
                # otherwise surface the real error.
                if out_type is None:
                    raise
        if out_type is None:
            raise CompileError(
                "term is stateful (or keyed) — pass out_type for the interpreter path"
            )
        return interpret_batch(
            self._term,
            self._df,
            out_type,
            value_col=self._value_col,
            seq_col=self._seq_col,
            key_col=self._key_col,
        )


def stream_of(
    df: DataFrame,
    value_col: str = "value",
    seq_col: str = "seq",
    key_col: str | None = None,
    dense_input: bool = False,
) -> RStream:
    """``dense_input=True`` declares the frame's ``seq`` dense and
    0-based (anything from ``to_stream_df``/``generate_range``) —
    position-dependent compiled lowerings then use ``seq`` directly and
    length-preserving terms skip output renumbering altogether."""
    return RStream(df, value_col, seq_col, key_col, dense_input=dense_input)


def _length_preserving(sp: StreamProcessor) -> bool:
    """True only for terms that emit exactly one output per input in
    order (pure map chains; alternate of two pure maps) — the terms
    whose output ordinals equal their input ordinals."""
    from rspl_spark.dsl.combinators import AlternateSP, ComposeSP

    if isinstance(sp, MapSP):
        return True
    if isinstance(sp, ComposeSP):
        return _length_preserving(sp.sp1) and _length_preserving(sp.sp2)
    if isinstance(sp, AlternateSP):
        return isinstance(sp.sp1, MapSP) and isinstance(sp.sp2, MapSP)
    return False
