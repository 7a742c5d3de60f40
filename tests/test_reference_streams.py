"""Ports of the reference's streams-module unit tests: cons/constant
(infinite_lists.rs:62-99), the seeded channel (overeager_receivers.rs:
52-97), and print-returns-rest (streams/mod.rs:79-91) — expressed
against our Spark stream encoding (seq-ordered DataFrames; the seed is
the first element; print advances the offset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rspl_spark.dsl.compiler import generate_range
from rspl_spark.dsl.interpreter import to_stream_df
from rspl_spark.streaming.sinks import print_stream
from rspl_spark.streaming.sources import seeded_batch_stream


def _values(df):
    return [r["value"] for r in df.orderBy("seq").collect()]


def test_constant_stream(spark):
    """infinite_lists.rs test_constant: head X, tail starts with X, X."""
    xs = generate_range(spark, 3, lambda _i: True)
    assert _values(xs) == [True, True, True]


def test_cons_prepend(spark):
    """infinite_lists.rs test_cons/test_head/test_tail: cons prepends —
    head is the consed element, tail starts with the stream."""
    rest = spark.createDataFrame([(1, False), (2, True)], "seq long, value boolean")
    head = spark.createDataFrame([(0, True)], "seq long, value boolean")
    stream = seeded_batch_stream(head, rest)
    vals = _values(stream)
    assert vals[0] is True  # head
    assert vals[1] is False  # tail().head()


def test_overeager_channel_seed_first(spark):
    """overeager_receivers.rs test_overeager_channel: channel(1, false)
    then enqueue true → head false (the seed), tail starts with true."""
    seed = spark.createDataFrame([(0, False)], "seq long, value boolean")
    sent = spark.createDataFrame([(1, True)], "seq long, value boolean")
    stream = seeded_batch_stream(seed, sent)
    assert _values(stream) == [False, True]


def test_print_skips_then_head_true(spark):
    """streams/mod.rs test_print: stream false,false,true,true,… —
    print 2 → the rest's head is true."""
    df = to_stream_df(spark, [0, 0, 1, 1, 1], value_type="long")
    rest = print_stream(df, 2)
    head = rest.orderBy("seq").limit(1).collect()[0]["value"]
    assert head == 1
