"""End-to-end corpus-pipeline properties:

1. batch/stream parity — the cleaning pipeline (quality filter →
   language filter → normalized dedup) produces the same survivor set
   whether run as one batch or incrementally over micro-batches (the
   stateless signals stream trivially; the dedup becomes
   dropDuplicatesWithinWatermark keyed on the normalization hash);
2. partitioned sink + partition pruning — cleaned output written
   partitionBy(lang) is read back with partition filters, not a scan.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rspl_spark.streaming.sources import file_stream, write_stream_chunks


def _signals(df):
    from rspl_spark.operators.text import lang_pred_expr, quality_expr

    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return df.select(
        "doc_id",
        "ts",
        quality_expr().alias("quality"),
        lang_pred_expr().alias("pred_lang"),
        F.md5(norm).alias("norm_h"),
    ).filter((F.col("quality") >= 0.5) & (F.col("pred_lang") == "en"))


def test_pipeline_batch_stream_parity(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200)
        # arrival order = doc_id order so streaming first-arrival dedup
        # matches the batch min-doc_id keeper rule
        .withColumn(
            "ts",
            (F.lit("2024-01-01 00:00:00").cast("timestamp") + F.col("doc_id") * F.expr("INTERVAL 1 SECOND")),
        )
        .select("doc_id", "text", "ts")
    )
    c1 = docs.filter(F.col("doc_id") % 2 == 0).orderBy("doc_id")
    c2 = docs.filter(F.col("doc_id") % 2 == 1).orderBy("doc_id")

    # batch: min doc_id per norm hash
    batch = _signals(docs)
    from pyspark.sql.window import Window

    w = Window.partitionBy("norm_h").orderBy("doc_id")
    batch_kept = {
        r["doc_id"]
        for r in batch.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    }

    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [c1, c2])
        stream = file_stream(spark, tmp, "doc_id long, text string, ts timestamp")
        cleaned = (
            _signals(stream)
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["norm_h"])
        )
        q = (
            cleaned.writeStream.format("memory")
            .queryName("t_pipe_parity")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        stream_rows = spark.table("t_pipe_parity").collect()

    # same number of survivors, one per distinct norm hash, and the
    # survivor SET of hashes matches; doc_ids may differ only when a
    # duplicate pair was split across the even/odd chunks (first arrival
    # in chunk order vs global min) — on this data survivors are unique
    # texts, so ids match too
    assert {r["doc_id"] for r in stream_rows} == batch_kept


def test_partitioned_sink_prunes_on_read(spark, tmp_path):
    from rspl_spark.operators.text import lang_pred_expr, quality_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    cleaned = docs.select(
        "doc_id", "text", quality_expr().alias("quality"), lang_pred_expr().alias("lang")
    ).filter(F.col("quality") >= 0.5)
    out = str(tmp_path / "clean_corpus")
    cleaned.write.partitionBy("lang").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the lang predicate must be a PartitionFilter (directory pruning),
    # never a data filter over a full scan
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "lang" in seg
    n_en = cleaned.filter(F.col("lang") == "en").count()
    assert back.count() == n_en and n_en > 0


def test_streaming_token_packing_matches_batch(spark):
    """Token packing as a streaming STATEFUL op: the per-source
    cumulative token counter is a Mealy machine (Get token count, Put
    bin index), so the engine's keyed FSM runner IS the streaming
    packer — state carries across micro-batches and the bin sequence
    matches the batch running-sum formulation exactly."""
    from pyspark.sql.window import Window

    from rspl_spark.dsl import Get, Put
    from rspl_spark.streaming import run_mealy_stream

    B = 2048

    def packer():
        def from_state(cum):
            return Get(lambda nt: Put(cum // B, lambda: from_state(cum + nt)))

        return from_state(0)

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            F.col("source").alias("key"),
            F.col("doc_id").alias("seq"),
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("value"),
        )
    )
    # batch truth: running sum per source ordered by doc_id
    w = (
        Window.partitionBy("key")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch = docs.withColumn("bin", ((F.sum("value").over(w) - F.col("value")) / B).cast("long"))
    truth = {
        k: [r["bin"] for r in rows]
        for k, rows in (
            (k, sorted(g, key=lambda r: r["seq"]))
            for k, g in __import__("itertools").groupby(
                sorted(batch.collect(), key=lambda r: (r["key"], r["seq"])),
                key=lambda r: r["key"],
            )
        )
    }

    c1 = docs.filter(F.col("seq") < 250).orderBy("seq")
    c2 = docs.filter(F.col("seq") >= 250).orderBy("seq")
    with tempfile.TemporaryDirectory() as tmp:
        write_stream_chunks(spark, tmp, [c1, c2])
        stream = file_stream(spark, tmp, "key string, seq long, value long")
        out = run_mealy_stream(stream, packer, "long")
        q = (
            out.writeStream.format("memory")
            .queryName("t_pack_stream")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got_rows = spark.table("t_pack_stream").collect()
    got = {}
    for r in sorted(got_rows, key=lambda r: (r["key"], r["seq"])):
        got.setdefault(r["key"], []).append(r["value"])
    assert got == truth
