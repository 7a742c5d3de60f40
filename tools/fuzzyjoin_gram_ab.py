"""A/B probe: does materializing the tokenized rows (id, toks) before
the vocab/rank subtrees pay in fuzzy_self_join?

The plain plan evaluates the char_trigrams kernel twice per corpus (the
vocab aggregate and the ranked-rows aggregate are different exchanges,
so ReusedExchange cannot share the projection); a lazy localCheckpoint
of tg evaluates it once but pays blocks for the (id, toks) frame —
LARGER than the source strings (L tokens x q bytes vs L bytes). The r12
triangle probe measured exactly that trade inverting at scale, so this
is decided by measurement, not intuition (OPTIMIZATION_r15 deferred
item 4).

Interleaved A/B (alternating runs, same session, same persisted input)
so box drift cannot masquerade as a win.

Usage: python tools/fuzzyjoin_gram_ab.py out.json 50000 200000
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from tools.fuzzyjoin_scale import NUM, DEN, _corpus  # noqa: E402

REPS = 3


def _join_body(tg: DataFrame, num: int, den: int) -> DataFrame:
    """fuzzy_self_join from the tokenized frame down — byte-for-byte the
    operator's plan (operators/fuzzyjoin.py) so the A/B isolates ONLY
    the tg materialization decision."""
    toks = tg.select("id", F.explode("toks").alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    rows = (
        toks.join(vocab, "tok")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("cnt", "tok"))).alias("ranks"))
        .select("id", "ranks", F.size("ranks").alias("sz"))
    )
    plen = F.col("sz") - F.expr(f"(sz * {num} + {den - 1}) div {den}") + F.lit(1)
    pref = rows.select(
        "id", "sz", F.explode(F.slice("ranks", F.lit(1), plen)).alias("r")
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.r") == F.col("b.r"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.least(F.col("a.sz"), F.col("b.sz")) * den
                >= F.greatest(F.col("a.sz"), F.col("b.sz")) * num
            ),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = rows.select(
        F.col("id").alias("id_a"), F.col("ranks").alias("ra"), F.col("sz").alias("size_a")
    )
    vb = rows.select(
        F.col("id").alias("id_b"), F.col("ranks").alias("rb"), F.col("sz").alias("size_b")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ra", "rb")).cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
        )
        .filter(
            F.col("inter") * den
            >= num * (F.col("size_a") + F.col("size_b") - F.col("inter"))
        )
    )


def main() -> None:
    from rspl_spark.operators.fuzzyjoin import char_trigrams, choose_q

    out_path, *sizes = sys.argv[1:]
    spark = (
        SparkSession.builder.appName("fuzzyjoin-gram-ab")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    result: dict = {"reps": REPS, "threshold": f"{NUM}/{DEN}", "legs": {}}
    for n_s in sizes:
        n = int(n_s)
        tag = f"n{n}"
        df = spark.read.parquet(_corpus(n)).repartition(32).persist()
        df.count()
        q = choose_q(df, "s")
        base = df.select(F.col("id"), F.col("s")).filter(F.col("s").isNotNull())
        tg_plain = base.select("id", char_trigrams(F.col("s"), q).alias("toks"))

        def run(materialize: bool) -> tuple[float, int]:
            spark.sparkContext.setJobDescription(
                f"gram_ab:{tag}:{'ckpt' if materialize else 'plain'}"
            )
            tg = tg_plain.localCheckpoint(eager=False) if materialize else tg_plain
            t0 = time.time()
            c = _join_body(tg, NUM, DEN).count()
            return time.time() - t0, c

        times = {"plain": [], "ckpt": []}
        counts = set()
        run(False)  # warm: scan cache, codegen
        for _ in range(REPS):
            t, c = run(False)
            times["plain"].append(round(t, 3))
            counts.add(c)
            t, c = run(True)
            times["ckpt"].append(round(t, 3))
            counts.add(c)
        assert len(counts) == 1, f"pair count diverged: {counts}"
        result["legs"][tag] = {
            "q": q,
            "pairs": counts.pop(),
            "plain_sec": times["plain"],
            "ckpt_sec": times["ckpt"],
            "plain_min": min(times["plain"]),
            "ckpt_min": min(times["ckpt"]),
        }
        print(tag, result["legs"][tag], flush=True)
        df.unpersist()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
