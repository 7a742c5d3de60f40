"""Measure fuzzy_self_join (prefix-filtered q-gram Jaccard, the r12
3x-staged plan) across scale decades on a record-linkage-shaped corpus
— mostly-distinct entity strings with a fixed fraction of injected
near-duplicates, the operator's target regime (the driver part table's
64 distinct names cannot exercise the prefix-filter claim; same
reasoning as the constant-degree triangle sweep's dedicated graphs).

Records wall-clock AND shuffle-write bytes (status REST API deltas —
the cluster-bound metric local[32]'s RAM-speed shuffle hides), plus
output pair counts. At the smallest decade the result is verified
against the guarded all-pairs form (cross join + exact trigram
intersection) — the parity anchor; the all-pairs form is then also
TIMED at each decade it can afford, so the sweep shows where the
prefix-filtered plan's candidate generation wins and by how much.

Usage:
    python tools/fuzzyjoin_scale.py out.json 5000 50000 500000
"""

from __future__ import annotations

import json
import os
import string
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

NUM, DEN = 75, 100
SEED = 42
NEARDUP_FRAC = 0.10
PARITY_MAX_N = 5_000       # all-pairs parity check only at/below this
NAIVE_TIME_MAX_N = 50_000  # time (not verify) all-pairs up to this


def _corpus(n: int) -> str:
    """n entity strings: 5-9 words of 6-10 random lowercase letters;
    NEARDUP_FRAC of rows copy an earlier row with ONE word replaced
    (a true near-duplicate at the 0.75 Jaccard threshold regime).
    Deterministic; cached on disk."""
    path = f".scaledata/fuzzy_corpus_n{n}.parquet"
    if os.path.exists(path):
        return path
    os.makedirs(".scaledata", exist_ok=True)
    rng = np.random.default_rng(SEED)
    letters = np.array(list(string.ascii_lowercase))

    def word():
        return "".join(rng.choice(letters, rng.integers(6, 11)))

    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < NEARDUP_FRAC:
            base = texts[rng.integers(0, i)].split(" ")
            base[rng.integers(0, len(base))] = word()
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(word() for _ in range(rng.integers(5, 10))))
    pq.write_table(
        pa.table({"id": np.arange(n, dtype=np.int64), "s": texts}),
        path,
        row_group_size=32768,
    )
    return path


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across completed stages so far (same
    methodology as tools/topk_scale.py)."""
    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def _naive_pairs(spark, df, q):
    """Guarded all-pairs reference: exact q-gram-set Jaccard over the
    full cross join (id_a < id_b) — O(n^2), the form the prefix filter
    exists to avoid; used for parity and for the cost curve. Must use
    the SAME q as the prefix-filtered side for parity to mean parity."""
    from rspl_spark.operators.fuzzyjoin import char_trigrams

    tg = df.select("id", F.array_distinct(char_trigrams(F.col("s"), q)).alias("t"))
    a, b = tg.alias("a"), tg.alias("b")
    inter = F.size(F.array_intersect("a.t", "b.t"))
    sz_a, sz_b = F.size("a.t"), F.size("b.t")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            inter.alias("inter"),
            sz_a.alias("size_a"),
            sz_b.alias("size_b"),
        )
        .filter(F.col("inter") * DEN >= NUM * (F.col("size_a") + F.col("size_b") - F.col("inter")))
        .select("id_a", "id_b")
    )


def main() -> None:
    from rspl_spark.operators.fuzzyjoin import choose_q, fuzzy_self_join

    out_path, *sizes = sys.argv[1:]
    spark = (
        SparkSession.builder.appName("fuzzyjoin-scale")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        # Spark's default broadcast threshold (10MB), deliberately: a
        # 64MB threshold let the n=500k leg try to broadcast the ranked
        # corpus into the driver (OOM) — and a real cluster would not
        # broadcast a corpus-sized table either; big legs must degrade
        # to shuffle joins for the measured curve to be the 100TB curve.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    times: dict[str, dict[str, float]] = {"fuzzy_self_join": {}, "naive_allpairs": {}}
    shuffle: dict[str, dict[str, int]] = {"fuzzy_self_join": {}, "naive_allpairs": {}}
    pairs: dict[str, int] = {}
    parity: dict[str, bool] = {}
    q_used: dict[str, int] = {}
    for n_s in sizes:
        n = int(n_s)
        tag = f"n{n}"
        # Spread the corpus across all cores and pin it in memory: the
        # small parquet files arrive as 1-2 splits, which leaves the
        # all-pairs reference a single-task BroadcastNestedLoopJoin —
        # an unfairly weak baseline (and hours of wall-clock at n=50k).
        # persist() keeps the repartition exchange out of the per-leg
        # shuffle-write deltas measured below.
        df = spark.read.parquet(_corpus(n)).repartition(32).persist()
        df.count()  # warm the scan + materialize the cache

        # pick q by the operator's own documented rule (grow q until the
        # gram vocabulary outpaces the corpus): fixed q=3 saturates on
        # mostly-distinct strings at 5*10^4 rows — measured 843 s for the
        # fuzzy side at n=50000 before this sweep adopted auto-q (the
        # saturation data point gram_frequency_stats' docstring predicts)
        q_used[tag] = choose_q(df, "s")

        s0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        out = fuzzy_self_join(df, "id", "s", NUM, DEN, q=q_used[tag])
        pairs[tag] = out.count()
        times["fuzzy_self_join"][tag] = round(time.time() - t0, 3)
        shuffle["fuzzy_self_join"][tag] = _shuffle_write_bytes(spark) - s0

        if n <= NAIVE_TIME_MAX_N:
            s0 = _shuffle_write_bytes(spark)
            t0 = time.time()
            naive = _naive_pairs(spark, df, q_used[tag])
            n_naive = naive.count()
            times["naive_allpairs"][tag] = round(time.time() - t0, 3)
            shuffle["naive_allpairs"][tag] = _shuffle_write_bytes(spark) - s0
            if n <= PARITY_MAX_N:
                got = {(r["id_a"], r["id_b"]) for r in out.select("id_a", "id_b").collect()}
                want = {(r["id_a"], r["id_b"]) for r in naive.collect()}
                parity[tag] = got == want
                assert parity[tag], f"parity FAILED at {tag}"
            else:
                assert n_naive == pairs[tag], f"pair-count mismatch at {tag}"
        print(f"{tag}: q={q_used[tag]} fuzzy={times['fuzzy_self_join'][tag]}s "
              f"pairs={pairs[tag]} "
              f"shuffle={shuffle['fuzzy_self_join'][tag]}", flush=True)
        df.unpersist()

    result = {
        "threshold": f"{NUM}/{DEN}",
        "neardup_frac": NEARDUP_FRAC,
        "q_used": q_used,
        "times": times,
        "shuffle_write_bytes": shuffle,
        "pairs": pairs,
        "parity_vs_allpairs": parity,
        "r14_reference_fixed_q3_sec": {
            "n5000": 72.351,
            "n50000": 842.823,
            "provenance": "measured ONCE on the r14 sandbox box "
                          "(2026-08-16, local[32]); historical reference "
                          "values, NOT re-measured by this run",
        },
        "notes": (
            "r12 verdict ask #4: fuzzyjoin scale rows with shuffle-write "
            "bytes (topk_scale methodology). Corpus: random 5-9-word "
            "entity strings, 10% injected one-word-edit near-dups — "
            "mostly-distinct strings, the record-linkage regime. "
            "fuzzy_self_join is the staged prefix-filtered plan "
            "(operators/fuzzyjoin.py) at q=choose_q (the operator's "
            "documented vocabulary-outpaces-corpus rule); naive_allpairs "
            "is the O(n^2) cross-join reference at the SAME q, verified "
            "identical at the smallest decade and timed while "
            "affordable. r14_reference_fixed_q3_sec records the r14-"
            "measured fuzzy-side times with q hardwired to 3 — "
            "the saturated-vocabulary degradation choose_q exists to "
            "avoid (trigram universe 26^3 is static while the corpus "
            "grows; candidates degrade toward quadratic)."
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
