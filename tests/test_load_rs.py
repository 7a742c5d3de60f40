"""Port of the reference's load test (tests/load.rs) — its only
performance-adjacent artifact (BASELINE.md): 10! = 3,628,800 elements
pushed through filter(is_even) ∘ map(factorial) ∘ map(+1), consuming
2 × 10! output elements.

Two paths:
- compiled: the exact 10!-element workload through the Catalyst-lowered
  pipeline (distributed — the Spark-first answer to the load shape);
- pure evaluator: the trampolined Python interpreter at 10% volume
  (the correctness-fallback path; full volume is the reference's
  opt-in #[ignore] regime).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # fuzz/streaming/scale tier: pytest -m "not slow" skips

import itertools
import math
import time

from pyspark.sql import functions as F

from rspl_spark.dsl import compile_batch, compose, eval_sp, filter_sp, map_sp

N = 10
FACT_N = math.factorial(N)  # 3,628,800


def _pipeline():
    return compose(
        compose(filter_sp(lambda n: n % 2 == 0), map_sp(_factorial_expr)),
        map_sp(lambda n: n + 1),
    )


def _factorial_expr(n):
    """Polymorphic factorial over 0..9: python ints AND Columns (a CASE
    ladder — factorial isn't closed-form, the domain is)."""
    try:
        from pyspark.sql import Column

        if isinstance(n, Column):
            expr = F.lit(math.factorial(0))
            for k in range(1, N):
                expr = F.when(n == k, math.factorial(k)).otherwise(expr)
            return expr
    except ImportError:  # pragma: no cover
        pass
    return math.factorial(n)


def test_load_rs_compiled_full_volume(spark):
    """The full 10!-element stream through the compiled pipeline: row
    count and checksum match the closed-form expectation."""
    # input = factorial(N) repetitions of 0..N-1 (load.rs:28-33), encoded
    # as range(10!*10) with value = seq % 10 — same multiset, same order.
    df = spark.range(FACT_N * N).select(
        F.col("id").alias("seq"), (F.col("id") % N).alias("value")
    )
    t0 = time.time()
    out = compile_batch(_pipeline(), df)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")
    ).collect()[0]
    elapsed = time.time() - t0
    # evens 0,2,4,6,8 → factorial+1 each, FACT_N occurrences per digit
    expected_n = 5 * FACT_N
    expected_s = FACT_N * sum(math.factorial(k) + 1 for k in (0, 2, 4, 6, 8))
    assert agg["n"] == expected_n
    assert agg["s"] == expected_s
    # perf envelope, generous: the reference leaves this workload opt-in;
    # Spark chews 36M input rows in a few seconds on local[8]
    assert elapsed < 60, f"compiled load took {elapsed:.1f}s"


def test_load_rs_evaluator_shape():
    """The same pipeline through the pure trampolined evaluator at 10%
    volume — exact element-level parity on a sampled prefix."""
    volume = FACT_N // 10
    stream = (n % N for n in range(volume * N))
    sp = _pipeline()
    count = 0
    checksum = 0
    for v in eval_sp(sp, stream):
        count += 1
        checksum += v
    assert count == 5 * volume
    assert checksum == volume * sum(math.factorial(k) + 1 for k in (0, 2, 4, 6, 8))


def test_load_rs_prefix_equivalence(spark):
    """Compiled and evaluator paths agree element-by-element on a
    finite prefix (the reference's print-based observation)."""
    from rspl_spark.dsl.interpreter import to_stream_df

    vals = [n % N for n in range(200)]
    compiled = [
        r["value"]
        for r in compile_batch(_pipeline(), to_stream_df(spark, vals))
        .orderBy("seq")
        .collect()
    ]
    pure = list(eval_sp(_pipeline(), vals))
    assert compiled == pure
