"""connected_components_star execution-path A/B: distributed star
rounds vs the size-gated driver union-find (r16).

Deterministic pseudo-random graphs with mixed component shapes (chains
of length 64 — deep enough to need several star rounds — plus 8-node
clusters), at growing edge counts. Per size: forced-distributed vs
forced-driver (spark.rspl.ccDriverMaxEdges = 0 / huge), interleaved,
median of reps, count() as the action (CC output is the terminal frame
here). The artifact that justifies spark.rspl.ccDriverMaxEdges.

Usage: python tools/cc_path_ab.py OUT.json [--edges 10000,65000,262000,1000000]
           [--reps 3]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rspl_spark.operators.dedup import connected_components_star  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402


def cpu_probe() -> float:
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return round(time.time() - t0, 3)


def graph(spark, n_edges: int):
    """Half chain edges (i -> i+1 within 64-node runs), half cluster
    edges (hash-spread 8-node cliquish stars); deterministic."""
    half = n_edges // 2
    chains = spark.range(half).select(
        F.when(F.col("id") % 64 == 63, F.col("id") - 1).otherwise(F.col("id")).alias("doc_a"),
        (F.when(F.col("id") % 64 == 63, F.col("id") - 1).otherwise(F.col("id")) + 1).alias("doc_b"),
    )
    base = 10_000_000_000
    clusters = spark.range(half).select(
        (base + (F.col("id") / 8).cast("long") * 8).alias("doc_a"),
        (base + (F.col("id") / 8).cast("long") * 8 + 1 + (F.col("id") * 2654435761) % 7).alias("doc_b"),
    )
    return chains.unionByName(clusters)


def time_path(spark, df, mode: str) -> float:
    spark.conf.set(
        "spark.rspl.ccDriverMaxEdges", "0" if mode == "distributed" else str(2**31)
    )
    spark.sparkContext.setJobDescription(f"cc_path_ab:{mode}")
    try:
        spark.catalog.clearCache()
        t0 = time.time()
        connected_components_star(df).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        spark.conf.unset("spark.rspl.ccDriverMaxEdges")
        spark.sparkContext.setJobDescription(None)


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = argv.pop(0)
    sizes = [10_000, 65_000, 262_000, 1_000_000]
    reps = 3
    while argv:
        a = argv.pop(0)
        if a == "--edges":
            sizes = [int(x) for x in argv.pop(0).split(",") if x]
        elif a == "--reps":
            reps = int(argv.pop(0))
        else:
            raise SystemExit(f"unknown arg {a!r}")
    spark = get_spark("cc-path-ab", cpus=32)
    out: dict = {"reps": reps}
    for n in sizes:
        df = graph(spark, n).localCheckpoint()  # isolate CC from generation
        probe0 = cpu_probe()
        runs = {"distributed": [], "driver": []}
        for m in runs:
            time_path(spark, df, m)  # warm
        for r in range(reps):
            order = list(runs) if r % 2 == 0 else list(runs)[::-1]
            for m in order:
                runs[m].append(time_path(spark, df, m))
        out[str(n)] = {
            "cpu_probe_sec": [probe0, cpu_probe()],
            "runs": runs,
            "median": {m: sorted(t)[len(t) // 2] for m, t in runs.items()},
        }
        print(n, json.dumps(out[str(n)]), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
