"""The operational day-2 story, composed end-to-end: one corpus split
into day-1 seed + day-2 increment drives BOTH persisted stores (MinHash
signatures for dedup, mergeable partials for rollups) plus sink
compaction — each day-2 step touches only the increment, and every
readout equals the full-history recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators import agg_store as A
from rspl_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures
from rspl_spark.operators.dedup_store import (
    append_increment,
    create_signature_store,
    dedup_increment,
)
from rspl_spark.operators.maintenance import compact_parquet, parquet_dir_stats

SF = "/root/testdata/sf0.001"

MEASURES = {
    "n_docs": ("doc_id", "count"),
    "tot_tokens": ("nt", "sum"),
    "max_tokens": ("nt", "max"),
}


def _with_tokens(df):
    return df.withColumn("nt", F.size(F.split(F.trim("text"), r"\s+")).cast("long"))


def test_day2_touches_only_the_increment_yet_matches_recompute(spark, tmp_path):
    docs = load(spark, SF, "documents")
    day1 = docs.filter(F.col("doc_id") % 4 != 0)
    day2 = docs.filter(F.col("doc_id") % 4 == 0)

    # ---- day 1: seed both stores, land the cleaned batch, compact ----
    sig_store = create_signature_store(
        spark, day1, "pipe_sigstore", overwrite=True
    )
    agg_store = A.create_agg_store(
        spark, _with_tokens(day1), "pipe_aggstore", ["source"], MEASURES,
        overwrite=True,
    )
    sink = str(tmp_path / "cleaned")
    day1.select("doc_id", "source", "text").repartition(16).write.parquet(sink)

    try:
        # ---- day 2: probe, append, merge, land, compact ----
        got_pairs = {
            (r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in dedup_increment(spark, day2, sig_store).collect()
        }
        append_increment(spark, day2, sig_store)
        A.merge_increment(spark, _with_tokens(day2), agg_store, ["source"], MEASURES)
        day2.select("doc_id", "source", "text").repartition(16).write.mode(
            "append"
        ).parquet(sink)
        n_before, _ = parquet_dir_stats(sink)
        stats = compact_parquet(spark, sink, target_file_bytes=1 << 30)

        # ---- every readout == full-history recompute ----
        sig = minhash_signatures(docs).localCheckpoint(eager=False)
        full_pairs = lsh_candidate_pairs(sig)
        want_pairs = {
            (r["doc_a"], r["doc_b"], r["est_jaccard"])
            for r in full_pairs.filter(
                (F.col("doc_a") % 4 == 0) | (F.col("doc_b") % 4 == 0)
            ).collect()
        }
        assert got_pairs == want_pairs

        got_agg = {
            r["source"]: (r["n_docs"], r["tot_tokens"], r["max_tokens"])
            for r in A.read_final(spark, agg_store).collect()
        }
        want_agg = {
            r["source"]: (r["n_docs"], r["tot_tokens"], r["max_tokens"])
            for r in A.partial_agg(_with_tokens(docs), ["source"], MEASURES).collect()
        }
        assert got_agg == want_agg

        assert stats["files_before"] == n_before >= 32
        assert stats["files_after"] == 1
        back = spark.read.parquet(sink)
        assert back.count() == docs.count()
        assert back.select(F.sum(F.length("text"))).collect()[0][0] == docs.select(
            F.sum(F.length("text"))
        ).collect()[0][0]
    finally:
        spark.sql("DROP TABLE IF EXISTS pipe_sigstore")
        spark.sql("DROP TABLE IF EXISTS pipe_aggstore")
