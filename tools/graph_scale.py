"""Measure the graph-family gates across scale decades (r9-style scale
rows): q_pagerank / q_khop_distances / q_triangle_counts at the given
sf dirs, wall-clock + output rows, written to docs/bench/.

Usage:
    python tools/graph_scale.py out.json /root/testdata/sf0.1 .scaledata/sf1 .scaledata/sf10
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspl_spark.queries import load_registry  # noqa: E402
from rspl_spark.session import get_spark

QUERIES = ("q_pagerank", "q_khop_distances", "q_triangle_counts")


def main() -> None:
    out_path, *dirs = sys.argv[1:]
    spark = get_spark("graph-scale", cpus=32)
    reg = load_registry()
    times: dict[str, dict[str, float]] = {q: {} for q in QUERIES}
    rows: dict[str, dict[str, int]] = {q: {} for q in QUERIES}
    for d in dirs:
        label = "sf" + d.rstrip("/").split("sf")[-1]
        for q in QUERIES:
            t0 = time.time()
            n = reg[q].fn(spark, d).count()
            dt = round(time.time() - t0, 3)
            times[q][label] = dt
            rows[q][label] = n
            print(f"{q} {label}: {dt}s rows={n}", flush=True)
    with open(out_path, "w") as f:
        json.dump({"times": times, "rows": rows}, f)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
