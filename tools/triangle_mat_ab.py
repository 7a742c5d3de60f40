"""Triangle-counts materialization A/B + scale sweep (r15 verdict ask #1).

Measures triangle_counts under the four materialization variants
(off / und / o / both, forced via spark.rspl.triangleMaterialize) on:

  1. the GATE shape (co-order graph from lineitem at an sf dir) — where
     r15's interleaved A/B measured materializing `und` winning −16%;
  2. constant-degree parquet-backed synthetic graphs at r12's probe
     sizes — where r12 measured materialization losing 1.4-4x.

Interleaved execution (variant order rotated per rep) with a noop sink,
cpu probe recorded per block, median of 3 reported with the raw runs —
the artifact that SETS spark.rspl.triangleMaterializeMaxBytes instead
of guessing it.

Usage: python tools/triangle_mat_ab.py OUT.json [--gate-sf DIR]
           [--sizes 1x,10x] [--variants off,und,o,both] [--reps 3]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rspl_spark.operators.graph import triangle_counts  # noqa: E402
from rspl_spark.plan_stats import leaf_input_bytes  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402

DEG = 12  # same constant-degree shape as the r12 probe
SIZES = {"1x": 100_000, "10x": 1_000_000, "100x": 10_000_000}  # nodes


def cpu_probe() -> float:
    t0 = time.time()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return round(time.time() - t0, 3)


def gate_edges(spark, sf_dir):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    return (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst"))
        .distinct()
    )


def synth_edges_parquet(spark, n_nodes: int, path: str):
    """r12's deterministic constant-degree generator, written to parquet
    and read back so the leaf-bytes signal matches a storage-backed edge
    list (what a 100 TB deployment actually reads)."""
    if not os.path.isdir(path):
        (
            spark.range(n_nodes * DEG)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                (
                    (
                        F.col("id") % n_nodes
                        + 1
                        + (F.col("id") * F.lit(2654435761)) % (n_nodes - 1)
                    )
                    % n_nodes
                ).alias("dst"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    return spark.read.parquet(path)


def time_variant(spark, edges_fn, variant: str) -> float:
    spark.conf.set("spark.rspl.triangleMaterialize", variant)
    spark.sparkContext.setJobDescription(f"tri_mat_ab:{variant}")
    try:
        spark.catalog.clearCache()
        t0 = time.time()
        triangle_counts(edges_fn()).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)
    finally:
        spark.conf.unset("spark.rspl.triangleMaterialize")
        spark.sparkContext.setJobDescription(None)


def run_block(spark, label: str, edges_fn, variants, reps, out) -> None:
    probe0 = cpu_probe()
    leaf = leaf_input_bytes(edges_fn())
    runs = {v: [] for v in variants}
    # warm each variant once (codegen/classload), then interleave
    for v in variants:
        time_variant(spark, edges_fn, v)
    for r in range(reps):
        order = variants[r % len(variants):] + variants[: r % len(variants)]
        for v in order:
            runs[v].append(time_variant(spark, edges_fn, v))
    out[label] = {
        "leaf_bytes": leaf,
        "cpu_probe_sec": [probe0, cpu_probe()],
        "runs": runs,
        "median": {v: sorted(ts)[len(ts) // 2] for v, ts in runs.items()},
    }
    print(label, json.dumps(out[label]), flush=True)


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = argv.pop(0)
    gate_sf = None
    sizes: list[str] = []
    variants = ["off", "und", "o", "both"]
    reps = 3
    while argv:
        a = argv.pop(0)
        if a == "--gate-sf":
            gate_sf = argv.pop(0)
        elif a == "--sizes":
            sizes = [s for s in argv.pop(0).split(",") if s]
        elif a == "--variants":
            variants = argv.pop(0).split(",")
        elif a == "--reps":
            reps = int(argv.pop(0))
        else:
            raise SystemExit(f"unknown arg {a!r}")
    spark = get_spark("tri-mat-ab", cpus=32)
    out: dict = {"deg": DEG, "variants": variants, "reps": reps}
    if gate_sf:
        run_block(spark, f"gate:{os.path.basename(gate_sf.rstrip('/'))}",
                  lambda: gate_edges(spark, gate_sf), variants, reps, out)
    tmp_root = "/tmp/rspl_tri_mat_ab"
    for s in sizes:
        n_nodes = SIZES[s]
        path = os.path.join(tmp_root, s)
        edges = synth_edges_parquet(spark, n_nodes, path)
        run_block(spark, f"synth:{s}:{n_nodes * DEG}_edges",
                  lambda e=edges: e, variants, reps, out)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path)
    shutil.rmtree(tmp_root, ignore_errors=True)


if __name__ == "__main__":
    main()
