"""Dump .explain("formatted") plans for the optimization round.

Usage: python tools/dump_plans_r15.py <suffix> [sf_dir] [query ...]
  suffix: "before" or "after" → plans/r15/<query>_<suffix>.txt

With no query list, dumps the bench-visible set (headline + probes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rspl_spark.queries import load_registry  # noqa: E402
from rspl_spark.session import get_spark  # noqa: E402

BENCH_SET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q_rollup",
    "q_window_running",
    "q_asof_join",
    "q_sessionize",
    "q_minhash_lsh_pairs",
    "q_cosine_topk_bruteforce",
    "q_tfidf_top_terms",
    "q_dsl_map_filter",
    "q9_product_type_profit",
    "q11_important_stock",
    "q_heavy_hitters_cms",
    "q_approx_distinct_hll",
    "q_approx_percentile_hist",
    "q_embedding_cosine_pairs",
]


def main() -> None:
    argv = list(sys.argv[1:])
    suffix = argv.pop(0) if argv else "before"
    sf_dir = argv.pop(0) if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.1"
    names = argv or BENCH_SET
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    reg = load_registry()
    spark = get_spark("plans-r15")
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:
            plan = f"ERROR dumping plan: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
