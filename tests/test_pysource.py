"""Custom Python DataSource (rspl_spark/pysource.py): batch contents,
partition-parallelism, key-filter pushdown (partition pruning observable
in the generated row volume), and the replayable micro-batch stream."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.pysource import ChannelDataSource, _value


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChannelDataSource)
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_batch_read_exact_contents(registered):
    df = (
        registered.read.format("rspl_channel")
        .option("n_keys", 3)
        .option("n_per_key", 10)
        .load()
    )
    rows = {(r["key"], r["seq"], r["value"]) for r in df.collect()}
    want = {(f"k{i}", s, _value(i, s)) for i in range(3) for s in range(10)}
    assert rows == want
    assert df.rdd.getNumPartitions() == 3  # one partition per key


def test_key_filter_pushdown_prunes_partitions(registered):
    df = (
        registered.read.format("rspl_channel")
        .option("n_keys", 8)
        .option("n_per_key", 5)
        .load()
        .filter(F.col("key") == "k3")
    )
    got = df.collect()
    assert {r["key"] for r in got} == {"k3"} and len(got) == 5
    # the pushed filter reaches the source: only ONE partition survives
    assert df.rdd.getNumPartitions() == 1


def test_no_matching_key_yields_empty_not_crash(registered):
    """A pushed filter matching no key must return zero rows — Spark
    replaces an empty partitions() list with [None], so the source ships
    an explicit empty partition instead."""
    df = (
        registered.read.format("rspl_channel")
        .option("n_keys", 4)
        .option("n_per_key", 5)
        .load()
        .filter(F.col("key") == "k9")
    )
    assert df.count() == 0


def test_stacked_key_filters_intersect(registered):
    """Two accepted key filters both claim full application at the
    source, so the source must enforce their INTERSECTION."""
    df = (
        registered.read.format("rspl_channel")
        .option("n_keys", 5)
        .option("n_per_key", 3)
        .load()
        .filter(F.col("key").isin("k1", "k2"))
        .filter(F.col("key").isin("k2", "k3"))
    )
    rows = df.collect()
    assert {r["key"] for r in rows} == {"k2"} and len(rows) == 3


def test_unsupported_filter_left_to_spark(registered):
    df = (
        registered.read.format("rspl_channel")
        .option("n_keys", 2)
        .option("n_per_key", 20)
        .load()
        .filter((F.col("seq") % 2 == 0) & (F.col("key") == "k1"))
    )
    rows = df.collect()
    assert {r["key"] for r in rows} == {"k1"}
    assert all(r["seq"] % 2 == 0 for r in rows) and len(rows) == 10


def test_stream_reader_replayable_microbatches(registered, tmp_path):
    q = (
        registered.readStream.format("rspl_channel")
        .option("n_keys", 2)
        .option("rate", 4)
        .load()
        .writeStream.format("memory")
        .queryName("t_pysource")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if registered.table("t_pysource").count() >= 16:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = registered.table("t_pysource").collect()
    assert len(rows) >= 16
    # exact per-(key, seq) payloads — batches drained in offset order
    for r in rows:
        assert r["value"] == _value(int(r["key"][1:]), r["seq"])
    seqs = sorted({r["seq"] for r in rows if r["key"] == "k0"})
    assert seqs == list(range(len(seqs)))  # gapless prefix per key
