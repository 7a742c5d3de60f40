"""Custom Python DataSource: the rspl channel as a first-class Spark
connector (batch + streaming).

The reference's only external source is ``OvereagerReceiver::channel(cap,
seed)`` (src/streams/overeager_receivers.rs:29-32): an unbounded keyed
channel whose seed element arrives ahead of everything else.
``streaming/sources.py`` maps that onto the FILE source for tests; this
module maps it onto Spark 4's Python DataSource API — the extension
point a deployment uses when the upstream system has no built-in
connector. Three contracts demonstrated, all pure Python, all running
distributed:

- partition-parallel batch reads (one ``InputPartition`` per channel
  key — the keyed-FSM parallelism model);
- filter PUSHDOWN into the source (`pushFilters`): an equality/IN
  predicate on ``key`` prunes whole partitions before any row is
  generated — the Python-source analog of parquet partition pruning;
- a micro-batch STREAM reader with replayable offsets
  (``SimpleDataSourceStreamReader``): offsets are dicts, a batch is
  re-readable between two offsets for failure recovery — the channel's
  unbounded tail with exactly-once bookkeeping.

Rows are deterministic (a seeded integer recurrence), so tests can
assert exact contents; a real connector swaps the generator for client
reads and keeps every contract here.

Register per session: ``spark.dataSource.register(ChannelDataSource)``,
then ``spark.read.format("rspl_channel")`` / ``spark.readStream...``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _value(key_idx: int, seq: int) -> int:
    # deterministic per-(key, seq) payload; cheap and collision-rich
    # enough to be interesting downstream
    return (key_idx * 1_000_003 + seq * 7919) % 104729


class _KeyPartition(InputPartition):
    def __init__(self, key_idx: int):
        self.key_idx = key_idx


class ChannelBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_keys = int(options.get("n_keys", 4))
        self.n_per_key = int(options.get("n_per_key", 100))
        self.keep: set[str] | None = None  # None = all keys

    def pushFilters(self, filters):
        """Accept key = 'kN' / key IN (...) filters; everything else is
        returned for Spark to re-apply. Accepted filters INTERSECT (each
        claims to be fully applied at the source, so all must hold);
        pruned partitions generate zero rows."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("key",):
                s = {f.value}
            elif isinstance(f, In) and f.attribute == ("key",):
                s = set(f.value)
            else:
                yield f  # unsupported — Spark keeps it in the plan
                continue
            self.keep = s if self.keep is None else self.keep & s

    def partitions(self):
        idxs = range(self.n_keys)
        if self.keep is not None:
            idxs = [i for i in idxs if f"k{i}" in self.keep]
        # never return []: Spark substitutes [None] for an empty list and
        # calls read(None) — a filter matching no key must yield zero
        # rows, not crash, so ship one explicit empty partition
        return [_KeyPartition(i) for i in idxs] or [_KeyPartition(-1)]

    def read(self, partition: _KeyPartition) -> Iterator[tuple]:
        i = partition.key_idx
        if i < 0:  # the empty sentinel partition
            return
        for s in range(self.n_per_key):
            yield (f"k{i}", s, _value(i, s))


class ChannelStreamReader(SimpleDataSourceStreamReader):
    """Unbounded channel: each micro-batch drains ``rate`` new elements
    per key. Offset = {"seq": next unread seq}; deterministic rows make
    readBetweenOffsets an exact replay (the recovery contract)."""

    def __init__(self, options):
        self.n_keys = int(options.get("n_keys", 2))
        self.rate = int(options.get("rate", 5))

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _rows(self, lo: int, hi: int) -> Iterator[tuple]:
        for s in range(lo, hi):
            for i in range(self.n_keys):
                yield (f"k{i}", s, _value(i, s))

    def read(self, start: dict):
        lo = start["seq"]
        hi = lo + self.rate
        # a LIST, not a generator: Spark's prefetching cache copy.copy()s
        # the returned iterator (datasource_internal.getCache), and
        # generators aren't copyable
        return list(self._rows(lo, hi)), {"seq": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return list(self._rows(start["seq"], end["seq"]))


class ChannelDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rspl_channel"

    def schema(self) -> str:
        return "key string, seq long, value long"

    def reader(self, schema) -> ChannelBatchReader:
        return ChannelBatchReader(self.options)

    def simpleStreamReader(self, schema) -> ChannelStreamReader:
        return ChannelStreamReader(self.options)
