"""Triangle-counting scale evidence on CONSTANT-DEGREE graphs.

The gate's co-order graph densifies with sf: the part vocabulary is
fixed (~200k nodes at sf1 AND sf10) while edges grow 12M → 120M, so
average degree grows 10× per decade and wedge work — Θ(Σ outdeg²),
the exact-enumeration lower bound — grows ~100×; at sf10 that is
~10^10 wedges and ~1 TB of shuffle spill, beyond this box's disk.
That curve is a property of the GRAPH, not the operator.

This script measures the operator on deterministic pseudo-random
graphs with the same edge counts but a CONSTANT average degree (nodes
grow with edges — the realistic social/web shape): linear scaling here
is the honest claim "triangle_counts scales with edges at fixed
density".

Usage: python tools/triangle_degree_scale.py out.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from rspl_spark.operators.graph import triangle_counts  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402

DEG = 12  # directed out-degree per node (undirected avg degree ~24)
SIZES = {"1x": 100_000, "10x": 1_000_000, "100x": 10_000_000}  # nodes


def main() -> None:
    out_path = sys.argv[1]
    spark = get_spark("tri-scale", cpus=32)
    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    edges_n: dict[str, int] = {}
    for label, n_nodes in SIZES.items():
        # node i gets DEG out-edges to multiplicative-hash targets —
        # deterministic, self-loop-free after the +1 offset
        e = (
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
        )
        edges_n[label] = n_nodes * DEG
        t0 = time.time()
        n = triangle_counts(e).count()
        times[label] = round(time.time() - t0, 3)
        rows[label] = n
        print(f"{label}: nodes={n_nodes} edges={n_nodes*DEG} "
              f"{times[label]}s tri_nodes={n}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"degree": DEG, "times": times, "rows": rows,
                   "edges": edges_n}, f)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
