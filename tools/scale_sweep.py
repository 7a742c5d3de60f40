"""Scale sweep: time registry queries across scale-factor directories.

Measures steady-state wall time (warm run first, then min of N timed
runs with cleared cache) for each named query at each sf dir, and
prints a JSON object {query: {sf_label: sec}} plus a markdown table
on stderr. Used for the sfX-vs-sfY flatness evidence in DEVNOTES.md.

Usage:
  python tools/scale_sweep.py /root/testdata/sf0.1 .scaledata/sf1 \
      -- q_minhash_lsh_pairs q_tfidf_top_terms ...
(no query names -> the bench.py headline set + top LLM gates)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspl_spark.queries import load_registry
from rspl_spark.session import get_spark

DEFAULT = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q10_returned_items", "q_rollup",
    "q_window_running", "q_asof_join", "q_sessionize",
    "q_minhash_lsh_pairs", "q_cosine_topk_bruteforce",
    "q_tfidf_top_terms", "q_dsl_map_filter",
    "q_ann_pq_adc", "q_semantic_dedup", "q_incremental_dedup",
]


def main() -> None:
    args = sys.argv[1:]
    if "--" in args:
        i = args.index("--")
        dirs, names = args[:i], args[i + 1 :]
    else:
        dirs, names = args, []
    if not dirs:
        dirs = ["/root/testdata/sf0.1", ".scaledata/sf1"]
    names = names or DEFAULT

    reg = load_registry()
    spark = get_spark("rspl-scale-sweep")

    def run(df) -> int:
        # noop sink, NOT count(): count() lets Catalyst prune every
        # non-key column through the aggregates — for q_approx_distinct_hll
        # it deleted the md5 sketch entirely (0.5s "measured" vs ~3s real
        # at sf10, DEVNOTES r6). The noop write materializes every output
        # column without sinking bytes.
        df.write.format("noop").mode("overwrite").save()
        return df.count()

    out: dict[str, dict[str, float]] = {n: {} for n in names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for d in dirs:
        label = os.path.basename(d.rstrip("/"))
        for n in names:
            fn = reg[n].fn
            run(fn(spark, d))  # warm: codegen/broadcast/memoized fits
            best, cnt = None, 0
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            cnt = fn(spark, d).count()
            out[n][label] = round(best, 3)
            rows[n][label] = cnt
            print(f"# {label} {n}: {out[n][label]}s ({cnt} rows)", file=sys.stderr)

    labels = [os.path.basename(d.rstrip("/")) for d in dirs]
    hdr = "| query | " + " | ".join(labels) + " | ratio |"
    print(hdr, file=sys.stderr)
    print("|" + "---|" * (len(labels) + 2), file=sys.stderr)
    for n in names:
        t = [out[n][lbl] for lbl in labels]
        ratio = round(t[-1] / t[0], 2) if t[0] else float("nan")
        print(
            f"| {n} | " + " | ".join(f"{x}" for x in t) + f" | {ratio}x |",
            file=sys.stderr,
        )
    print(json.dumps({"times": out, "rows": rows}))


if __name__ == "__main__":
    main()
