"""tfidf (doc, term)-aggregate materialization A/B + corpus scale sweep
(r15 verdict ask #1 — "probe where it inverts").

tfidf_top_terms scans and token-explodes the corpus TWICE (tf branch +
dfreq branch; both r15 plan dumps show it). Materializing the (doc,
term) aggregate trades one extra job barrier + small blocks for the
second full scan+explode. This sweep measures plain vs materialized
(forced via spark.rspl.tfidfMaterialize) on the gate corpus and on
parquet-backed synthetic corpora shaped like the gate's documents
(~54 words/doc) at growing doc counts — the artifact that SETS
spark.rspl.tfidfMaterializeMinBytes.

Usage: python tools/tfidf_mat_ab.py OUT.json [--gate-sf DIR]
           [--docs 10000,100000,1000000] [--reps 3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rspl_spark.operators.text import tfidf_top_terms  # noqa: E402
from rspl_spark.plan_stats import leaf_input_bytes  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402

WORDS_PER_DOC = 54  # gate documents average (sf0.1: 54.1 words, 297 chars)
VOCAB = 20_000


def cpu_probe() -> float:
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return round(time.time() - t0, 3)


def synth_corpus_parquet(spark, n_docs: int, path: str):
    """Deterministic corpus: n_docs docs of WORDS_PER_DOC words drawn
    from a VOCAB-word vocabulary by multiplicative hash — written to
    parquet and read back so leaf bytes match a storage-backed corpus."""
    if not os.path.isdir(path):
        words = F.transform(
            F.sequence(F.lit(0), F.lit(WORDS_PER_DOC - 1)),
            lambda i: F.concat(
                F.lit("w"),
                ((F.col("id") * WORDS_PER_DOC + i) * 2654435761 % VOCAB).cast("string"),
            ),
        )
        (
            spark.range(n_docs)
            .select(F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def time_variant(spark, corpus, variant: str) -> float:
    spark.conf.set("spark.rspl.tfidfMaterialize", variant)
    spark.sparkContext.setJobDescription(f"tfidf_mat_ab:{variant}")
    try:
        spark.catalog.clearCache()
        t0 = time.time()
        tfidf_top_terms(corpus, k=3).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        spark.conf.unset("spark.rspl.tfidfMaterialize")
        spark.sparkContext.setJobDescription(None)


def run_block(spark, label: str, corpus, reps, out) -> None:
    variants = ["off", "on"]
    probe0 = cpu_probe()
    leaf = leaf_input_bytes(corpus)
    runs = {v: [] for v in variants}
    for v in variants:
        time_variant(spark, corpus, v)  # warm
    for r in range(reps):
        order = variants if r % 2 == 0 else variants[::-1]
        for v in order:
            runs[v].append(time_variant(spark, corpus, v))
    out[label] = {
        "leaf_bytes": leaf,
        "cpu_probe_sec": [probe0, cpu_probe()],
        "runs": runs,
        "median": {v: sorted(ts)[len(ts) // 2] for v, ts in runs.items()},
    }
    print(label, json.dumps(out[label]), flush=True)
    if out.get("_path"):  # incremental: a late-block OOM keeps the rest
        done = {k: v for k, v in out.items() if k != "_path"}
        with open(out["_path"], "w") as f:
            json.dump(done, f, indent=1)


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = argv.pop(0)
    gate_sf = None
    docs: list[int] = []
    reps = 3
    while argv:
        a = argv.pop(0)
        if a == "--gate-sf":
            gate_sf = argv.pop(0)
        elif a == "--docs":
            docs = [int(x) for x in argv.pop(0).split(",") if x]
        elif a == "--reps":
            reps = int(argv.pop(0))
        else:
            raise SystemExit(f"unknown arg {a!r}")
    spark = get_spark("tfidf-mat-ab", cpus=32)
    out: dict = {"words_per_doc": WORDS_PER_DOC, "vocab": VOCAB, "reps": reps,
                 "_path": out_path}
    if gate_sf:
        corpus = spark.read.parquet(os.path.join(gate_sf, "documents.parquet"))
        run_block(spark, f"gate:{os.path.basename(gate_sf.rstrip('/'))}",
                  corpus.select("doc_id", "text"), reps, out)
    tmp_root = "/tmp/rspl_tfidf_mat_ab"
    for n in docs:
        corpus = synth_corpus_parquet(spark, n, os.path.join(tmp_root, str(n)))
        run_block(spark, f"synth:{n}_docs", corpus, reps, out)
    done = {k: v for k, v in out.items() if k != "_path"}
    with open(out_path, "w") as f:
        json.dump(done, f, indent=1)
    print("wrote", out_path)
    shutil.rmtree(tmp_root, ignore_errors=True)


if __name__ == "__main__":
    main()
