"""Sources/sinks (SURVEY.md §2.2): csv/json scan with explicit schema,
parquet sink roundtrip, partitioned writes, approx aggregates with
tolerance bands (sketches are not oracle-hashable)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rspl_spark.catalog import load


def test_csv_scan_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "c.csv")
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, 3.5)], "id long, s string, v double"
    )
    src.write.option("header", True).csv(p)
    back = spark.read.schema("id long, s string, v double").option("header", True).csv(p)
    assert back.schema.simpleString() == src.schema.simpleString()
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [(1, "a"), (2, "b"), (3, None)]


def test_json_scan_explicit_schema(spark, tmp_path):
    p = str(tmp_path / "j.json")
    src = spark.createDataFrame(
        [(1, {"k": 5}, ["x", "y"])], "id long, m struct<k:long>, arr array<string>"
    )
    src.write.json(p)
    back = spark.read.schema("id long, m struct<k:long>, arr array<string>").json(p)
    r = back.collect()[0]
    assert (r["id"], r["m"]["k"], list(r["arr"])) == (1, 5, ["x", "y"])


def test_orc_roundtrip(spark, tmp_path):
    p = str(tmp_path / "o.orc")
    src = load(spark, "/root/testdata/sf0.001", "nation")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == src.schema
    assert back.count() == 25


def test_parquet_sink_partitioned(spark, tmp_path):
    """Partitioned write = the scale-out layout (partition pruning on
    read); verify pruning reaches the file listing."""
    p = str(tmp_path / "part.parquet")
    o = load(spark, "/root/testdata/sf0.001", "orders")
    o.withColumn("yr", F.year("o_orderdate")).write.partitionBy("yr").parquet(p)
    back = spark.read.parquet(p).filter(F.col("yr") == 1997)
    assert back.count() == o.filter(F.year("o_orderdate") == 1997).count()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(yr" in plan


def test_approx_count_distinct_tolerance(spark):
    l = load(spark, "/root/testdata/sf0.01", "lineitem")
    exact = l.select(F.countDistinct("l_partkey")).collect()[0][0]
    approx = l.select(F.approx_count_distinct("l_partkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.1


def test_percentile_approx_tolerance(spark):
    l = load(spark, "/root/testdata/sf0.01", "lineitem")
    exact = l.select(F.percentile("l_extendedprice", F.lit(0.5))).collect()[0][0]
    approx = l.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000))
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.02


def test_to_json_schema_of_json_roundtrip(spark):
    """to_json / schema_of_json / from_json close the loop (formatting is
    engine-specific, so pytest rather than the cross-engine oracle)."""
    df = spark.createDataFrame([(1, ("a", 2))], "id long, s struct<x:string,y:long>")
    j = df.select("id", F.to_json("s").alias("js"))
    row = j.collect()[0]
    assert row["js"] == '{"x":"a","y":2}'
    schema = spark.range(1).select(
        F.schema_of_json(F.lit('{"x":"a","y":2}')).alias("sch")
    ).collect()[0]["sch"]
    assert "x" in schema and "y" in schema
    back = j.select("id", F.from_json("js", "x string, y long").alias("s2"))
    r = back.collect()[0]
    assert (r["s2"]["x"], r["s2"]["y"]) == ("a", 2)


def test_entry_contract_smoke(spark):
    """The driver's smoke check: entry() produces rows with stable schema."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() > 0
    assert df.columns[:2] == ["l_returnflag", "l_linestatus"]


def test_kafka_record_decode_and_seed(spark):
    """Kafka wiring minus the broker: decode_kafka_records must turn a
    Kafka-shaped frame (binary value + broker metadata) into an rspl
    (key, seq, value) stream with the seed row ordered ahead — the
    channel-seed semantics of overeager_receivers.rs:29-32."""
    import json as _json

    from pyspark.sql import functions as F

    from rspl_spark.streaming import decode_kafka_records

    records = [
        (bytearray(_json.dumps({"key": "k", "seq": i + 1, "value": i * 10}).encode()), i)
        for i in range(4)
    ]
    raw = spark.createDataFrame(records, "value binary, offset long")
    seed = spark.createDataFrame([("k", 0, -1)], "key string, seq long, value long")
    out = decode_kafka_records(raw, "key string, seq long, value long", seed_df=seed)
    rows = [(r["seq"], r["value"]) for r in out.orderBy("seq").collect()]
    assert rows == [(0, -1), (1, 0), (2, 10), (3, 20), (4, 30)]


def test_kafka_decode_seed_on_streaming_frame(spark):
    """The seed path against a REAL streaming raw frame: Spark refuses a
    streaming/batch union, so decode_kafka_records must lift the batch
    seed into a stream. Before the fix this raised AnalysisException at
    query start."""
    import json as _json
    import tempfile

    from pyspark.sql import functions as F

    from rspl_spark.streaming import decode_kafka_records
    from rspl_spark.streaming.sources import file_stream, write_stream_chunks

    records = [
        (bytearray(_json.dumps({"key": "k", "seq": i + 1, "value": i * 10}).encode()),)
        for i in range(3)
    ]
    batch = spark.createDataFrame(records, "value binary")
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [batch])
        raw = file_stream(spark, tmp, "value binary")
        assert raw.isStreaming
        seed = spark.createDataFrame([("k", 0, -1)], "key string, seq long, value long")
        out = decode_kafka_records(raw, "key string, seq long, value long", seed_df=seed)
        q = (
            out.writeStream.format("memory")
            .queryName("t_kafka_seed_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = [
            (r["seq"], r["value"])
            for r in spark.table("t_kafka_seed_stream").orderBy("seq").collect()
        ]
        assert rows == [(0, -1), (1, 0), (2, 10), (3, 20)]


def test_kafka_stream_option_plumbing(spark):
    """kafka_stream builds the reader with the right source options; the
    kafka connector jar is absent here, so constructing the plan must
    fail with the missing-data-source error (not an option error)."""
    import pytest as _pytest

    from rspl_spark.streaming import kafka_stream

    with _pytest.raises(Exception) as ei:
        kafka_stream(
            spark,
            brokers="broker1:9092",
            topic="events",
            value_schema="key string, seq long, value long",
            max_offsets_per_trigger=1000,
        )
    assert "kafka" in str(ei.value).lower()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Evolving pipelines append columns over time; mergeSchema reads
    the union schema with NULLs where a file predates a column."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "evolve")
    spark.range(3).select(F.col("id"), F.lit("a").alias("src")).write.parquet(
        p + "/day=1"
    )
    spark.range(3, 6).select(
        F.col("id"), F.lit("b").alias("src"), (F.col("id") * 2).alias("score")
    ).write.parquet(p + "/day=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "src", "score", "day"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[4] == 8
    # without mergeSchema, Spark picks one file's schema — document the
    # footgun by asserting the merged read is the superset
    narrow = spark.read.parquet(p)
    assert set(narrow.columns) <= set(merged.columns)


def test_json_corrupt_records_permissive_and_dropmalformed(spark, tmp_path):
    """Real corpora contain broken JSON lines; PERMISSIVE captures them
    in _corrupt_record for quarantining, DROPMALFORMED silently skips —
    the two policies a cleaning pipeline chooses between."""
    p = str(tmp_path / "j.jsonl")
    with open(p, "w") as f:
        f.write('{"doc_id": 1, "text": "ok"}\n')
        f.write('{"doc_id": 2, "text": "also ok"}\n')
        f.write('{"doc_id": 3, "text": NOT JSON\n')
    schema = "doc_id long, text string, _corrupt_record string"
    perm = spark.read.schema(schema).json(p)
    bad = perm.filter(perm._corrupt_record.isNotNull()).collect()
    good = perm.filter(perm._corrupt_record.isNull()).collect()
    assert len(bad) == 1 and len(good) == 2
    dropm = (
        spark.read.schema("doc_id long, text string")
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    assert dropm.count() == 2


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    from pyspark.sql import functions as F

    p = str(tmp_path / "orc_push")
    spark.range(1000).select(
        "id", (F.col("id") * 2).alias("v"), F.lit("pad").alias("w")
    ).write.orc(p)
    df = spark.read.orc(p).filter(F.col("id") > 500).select("v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(id,500)" in plan  # predicate reaches the ORC scan
    assert "w" not in plan.split("ReadSchema")[-1][:200]  # untouched col pruned
