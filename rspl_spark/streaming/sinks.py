"""Sinks + the reference's `print` observation (R10).

``print(stream, n)`` (src/streams/mod.rs:41-52) prints n elements and
returns the REST of the stream — observation with offset tracking. Batch
analog below; in streaming the console sink + source offsets play the
same role.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def print_stream(df: DataFrame, n: int, seq_col: str = "seq") -> DataFrame:
    """Print the first n elements (by seq); return the rest as a DataFrame.

    Mirror of `print` (streams/mod.rs:41-52): a side-effecting take-n that
    leaves the remainder consumable. The driver-side show() is bounded
    (n rows), the remainder stays lazy/distributed.
    """
    # ONE action: collect the head, print from the collected rows. Two
    # separate actions (show + collect) re-run the orderBy/limit and can
    # disagree when seq has ties — printing one set while advancing past
    # another. The cut below assumes seq is a total order for THIS stream
    # (the single-stream contract of the reference's print; keyed frames
    # with per-key ordinals need a per-key cut instead).
    rows = df.orderBy(seq_col).limit(n).collect()
    if not rows:
        return df.filter(F.lit(False))
    for r in rows:
        print(r.asDict())
    last_seq = max(r[seq_col] for r in rows)
    return df.filter(F.col(seq_col) > last_seq)


def to_console(stream_df: DataFrame, timeout_s: int = 60):
    """Console sink, AvailableNow — the streaming `print`."""
    q = (
        stream_df.writeStream.format("console")
        .option("numRows", 20)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"console sink did not finish within {timeout_s}s")
    return q


def to_parquet_sink(stream_df: DataFrame, path: str, checkpoint: str, timeout_s: int = 120):
    """File sink with checkpointing — the durable streaming output path
    (exactly-once via checkpoint + idempotent file commits)."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # a False return means STILL RUNNING: surfacing it prevents callers
    # reading a partially-written sink as the complete AvailableNow result
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(f"parquet sink did not finish within {timeout_s}s")
    return q
