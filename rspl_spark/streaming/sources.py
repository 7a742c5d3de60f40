"""Streaming sources with rspl semantics.

The reference's external source is ``OvereagerReceiver::channel(cap, seed)``
(src/streams/overeager_receivers.rs:29-32): a channel plus a seed element
that becomes the stream's first head, with one-element lookahead. Spark
mapping (SURVEY.md §1.3): a file/Kafka source; the seed is an initial row
ordered ahead of the stream; lookahead/backpressure is the source's own
prefetch (maxFilesPerTrigger / maxOffsetsPerTrigger).

For deterministic finite-prefix tests (the reference's own test style) we
use the file source with ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``:
each chunk file becomes one micro-batch, processed in mtime order.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession


def write_stream_chunks(spark: SparkSession, out_dir: str, chunks: list[DataFrame]) -> None:
    """Write each DataFrame as one parquet chunk file = one micro-batch.

    mtimes are forced strictly increasing so the file source replays
    chunks in order (its default ordering is modification time).
    """
    os.makedirs(out_dir, exist_ok=True)
    for i, chunk in enumerate(chunks):
        path = os.path.join(out_dir, f"chunk_{i:05d}")
        chunk.coalesce(1).write.mode("overwrite").parquet(path)
        t = time.time() + i  # monotone mtimes, 1s apart
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))


def file_stream(spark: SparkSession, in_dir: str, schema: str) -> DataFrame:
    """One-file-per-micro-batch streaming read of chunk dirs."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )


def seeded_batch_stream(seed_df: DataFrame, stream_df: DataFrame) -> DataFrame:
    """Batch analog of the seeded channel: the seed row(s) precede the
    stream (overeager_receivers.rs:29-32; tests rely on the seed driving
    the first decision, tests/basic.rs:32,47). Caller guarantees seq
    ordering puts the seed first. For true streaming, write the seed as
    chunk 0 via write_stream_chunks."""
    return seed_df.unionByName(stream_df)


def run_to_memory_sink(stream_df: DataFrame, name: str, timeout_s: int = 120):
    """Drive a streaming DataFrame to completion into an in-memory table
    (AvailableNow trigger = process everything currently available, then
    stop — the finite-prefix observation the reference's tests use)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
