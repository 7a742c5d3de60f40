"""Time EVERY registered query engine-side (no oracle) with the noop sink.

Optimization-round measurement baseline (guide §1.4): times
``fn(spark, sf_dir)`` + a noop write — fn() included because streaming
gates execute their micro-batch replay inside fn, and plan construction
is part of the honest cost. Warm run first, then min of 2 timed runs
with the cache cleared (steady-state engine time, not JIT).

Usage: python tools/time_registry.py [--json OUT.json] [--resume]
           [--skip q1,q2] [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspl_spark.queries import load_registry  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402


def run_one(spark, spec, sf_dir: str) -> dict:
    def once() -> float:
        spark.catalog.clearCache()
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    spark.sparkContext.setJobDescription(f"time_registry:{spec.name}")
    try:
        once()  # warm: codegen, broadcast build, classloading
        best = min(once(), once())
        return {"sec": round(best, 3), "status": "ok"}
    finally:
        spark.sparkContext.setJobDescription(None)


def main() -> int:
    argv = list(sys.argv[1:])
    out_path, resume, skip = None, False, set()
    if "--json" in argv:
        i = argv.index("--json")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    if "--resume" in argv:
        resume = True
        argv.remove("--resume")
    if "--skip" in argv:
        i = argv.index("--skip")
        skip = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sf_dir = argv.pop(0) if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    only = set(argv)

    reg = load_registry()
    results: dict[str, dict] = {}
    if resume and out_path and os.path.exists(out_path):
        results = json.load(open(out_path)).get("queries", {})

    spark = get_spark("time-registry")
    names = [n for n in sorted(reg) if (not only or n in only)]
    for i, name in enumerate(names):
        if name in skip:
            results[name] = {"status": "skipped"}
            continue
        if resume and results.get(name, {}).get("status") == "ok":
            continue
        t0 = time.time()
        try:
            results[name] = run_one(spark, reg[name], sf_dir)
        except Exception as e:
            results[name] = {"status": "error", "detail": str(e)[:300]}
        print(f"[{i + 1}/{len(names)}] {name}: {results[name]}", file=sys.stderr, flush=True)
        if out_path:
            total = round(sum(r.get("sec", 0) for r in results.values()), 3)
            json.dump({"sf_dir": sf_dir, "total_sec": total, "queries": results},
                      open(out_path, "w"), indent=1, sort_keys=True)
    oks = sorted(((r["sec"], n) for n, r in results.items() if r.get("status") == "ok"),
                 reverse=True)
    print("\n== slowest 30 ==", file=sys.stderr)
    for sec, n in oks[:30]:
        print(f"  {sec:8.3f}  {n}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
