"""Measure cms_topk_exact vs the naive exact top-k across scale
decades on a Zipf-distributed key corpus — the operator's target
regime (real heavy hitters over a large distinct-key domain; the
driver corpus's 31-word vocabulary cannot exercise the claim, same
reasoning as the constant-degree triangle sweep's dedicated graphs).
Both sides compute the EXACT top-k (results asserted identical); the
naive form shuffles every distinct key, the CMS-prefiltered form's
exchange carries only plausible heavy hitters
(operators/sketches.py:702). Wall-clock + parity, written to
docs/bench/.

Usage:
    python tools/topk_scale.py out.json 1200000 12000000 120000000
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

K = 20
ZIPF_A = 1.3
SEED = 42


def _corpus(n: int) -> str:
    """Deterministic Zipf(1.3) key draw of size n, cached on disk."""
    path = f".scaledata/topk_zipf_n{n}.parquet"
    if not os.path.exists(path):
        os.makedirs(".scaledata", exist_ok=True)
        rng = np.random.default_rng(SEED)
        keys = rng.zipf(ZIPF_A, n).astype(np.int64)
        pq.write_table(pa.table({"key": keys}), path)
    return path


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle-write bytes across completed stages so far (the
    cluster-bound cost local[32]'s RAM-speed shuffle hides) — read
    from the status REST API; deltas around a query isolate it."""
    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def main() -> None:
    from rspl_spark.operators.sketches import cms_topk_exact

    out_path, *sizes = sys.argv[1:]
    # the engine session disables the UI; the status REST API needs it,
    # so this harness builds its own session with the same query config
    spark = (
        SparkSession.builder.appName("topk-scale")
        .master("local[32]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    times: dict[str, dict[str, float]] = {"cms_topk_exact": {}, "naive_topk": {}}
    shuffle: dict[str, dict[str, int]] = {"cms_topk_exact": {}, "naive_topk": {}}
    vocab: dict[str, int] = {}
    for s in sizes:
        n = int(s)
        label = f"n{n}"
        occ = spark.read.parquet(_corpus(n))
        vocab[label] = occ.distinct().count()

        b0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        got = [tuple(r) for r in cms_topk_exact(occ, "key", k=K).collect()]
        times["cms_topk_exact"][label] = round(time.time() - t0, 3)
        shuffle["cms_topk_exact"][label] = _shuffle_write_bytes(spark) - b0

        b0 = _shuffle_write_bytes(spark)
        t0 = time.time()
        want = [
            tuple(r)
            for r in occ.groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.desc("n"), F.asc("key"))
            .limit(K)
            .collect()
        ]
        times["naive_topk"][label] = round(time.time() - t0, 3)
        shuffle["naive_topk"][label] = _shuffle_write_bytes(spark) - b0
        assert got == want, f"parity broken at {label}"
        print(
            f"{label}: cms={times['cms_topk_exact'][label]}s"
            f"/{shuffle['cms_topk_exact'][label]}B shuffled, "
            f"naive={times['naive_topk'][label]}s"
            f"/{shuffle['naive_topk'][label]}B shuffled, "
            f"distinct={vocab[label]} (results identical)",
            flush=True,
        )
    with open(out_path, "w") as f:
        json.dump(
            {
                "times": times,
                "shuffle_write_bytes": shuffle,
                "k": K,
                "zipf_a": ZIPF_A,
                "distinct_keys": vocab,
            },
            f,
        )
    print("wrote", out_path)


if __name__ == "__main__":
    main()
