"""Property-based DSL tests (hypothesis): algebraic laws from the
reference's semantics hold for arbitrary terms and inputs, and the
compiled path always agrees with the pure evaluator."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from rspl_spark.dsl import compose, eval_sp, filter_sp, map_sp
from rspl_spark.dsl.combinators import FilterSP, MapSP


def _stage(kind: str, a: int):
    if kind == "add":
        return MapSP(lambda x, a=a: x + a)
    if kind == "mul":
        return MapSP(lambda x, a=a: x * (a % 5 + 1))
    if kind == "gt":
        return FilterSP(lambda x, a=a: x > a)
    return FilterSP(lambda x, a=a: x % (a % 7 + 2) == 0)


stages = st.lists(
    st.tuples(st.sampled_from(["add", "mul", "gt", "mod"]), st.integers(-50, 50)),
    min_size=1,
    max_size=6,
)
inputs = st.lists(st.integers(-1000, 1000), max_size=60)


def _chain(spec):
    sp = _stage(*spec[0])
    for s in spec[1:]:
        sp = compose(sp, _stage(*s))
    return sp


@given(stages, inputs)
@settings(max_examples=200, deadline=None)
def test_compose_chain_equals_python_pipeline(spec, xs):
    """compose of map/filter ≡ the plain Python map/filter pipeline."""
    got = list(eval_sp(_chain(spec), xs))
    want = list(xs)
    for kind, a in spec:
        if kind == "add":
            want = [x + a for x in want]
        elif kind == "mul":
            want = [x * (a % 5 + 1) for x in want]
        elif kind == "gt":
            want = [x for x in want if x > a]
        else:
            want = [x for x in want if x % (a % 7 + 2) == 0]
    assert got == want


@given(stages, stages, stages, inputs)
@settings(max_examples=100, deadline=None)
def test_compose_associativity(s1, s2, s3, xs):
    """compose is category composition (src/combinators.rs:79-80):
    (f∘g)∘h ≡ f∘(g∘h) on every input prefix."""
    a, b, c = _chain(s1), _chain(s2), _chain(s3)
    a2, b2, c2 = _chain(s1), _chain(s2), _chain(s3)
    left = list(eval_sp(compose(compose(a, b), c), xs))
    right = list(eval_sp(compose(a2, compose(b2, c2)), xs))
    assert left == right


@given(stages, inputs)
@settings(max_examples=30, deadline=None)
def test_prefix_monotone(spec, xs):
    """Prefix semantics (SURVEY §1.3): output on a prefix of the input is
    a prefix of the output on the full input."""
    sp = _chain(spec)
    full = list(eval_sp(sp, xs))
    half = list(eval_sp(_chain(spec), xs[: len(xs) // 2]))
    assert full[: len(half)] == half


def test_compiled_alternate_maps_equals_eval_random(spark):
    """Property: compiled alternate(map f, map g) ≡ evaluator for random
    map pairs and inputs."""
    import random

    from rspl_spark.dsl import alternate, compile_batch
    from rspl_spark.dsl.interpreter import to_stream_df

    rng = random.Random(7)
    for _ in range(6):
        a1, a2 = rng.randint(-9, 9), rng.randint(-9, 9)
        m1, m2 = rng.randint(1, 5), rng.randint(1, 5)
        sp = alternate(
            MapSP(lambda x, a=a1, m=m1: x * m + a),
            MapSP(lambda x, a=a2, m=m2: x * m - a),
        )
        sp2 = alternate(
            MapSP(lambda x, a=a1, m=m1: x * m + a),
            MapSP(lambda x, a=a2, m=m2: x * m - a),
        )
        xs = [rng.randint(-100, 100) for _ in range(rng.randint(0, 25))]
        got = [
            r["value"]
            for r in compile_batch(sp, to_stream_df(spark, xs)).orderBy("seq").collect()
        ]
        from rspl_spark.dsl import eval_sp

        assert got == list(eval_sp(sp2, xs))


def test_compiled_equals_eval_on_random_chains(spark):
    """Spark-compiled result ≡ pure evaluator for sampled random chains
    (one Spark session, a handful of drawn examples)."""
    import random

    from rspl_spark.dsl import compile_batch
    from rspl_spark.dsl.interpreter import to_stream_df

    rng = random.Random(42)
    for _ in range(8):
        spec = [
            (rng.choice(["add", "mul", "gt", "mod"]), rng.randint(-50, 50))
            for _ in range(rng.randint(1, 5))
        ]
        xs = [rng.randint(-1000, 1000) for _ in range(rng.randint(0, 40))]
        sp = _chain(spec)
        want = list(eval_sp(_chain(spec), xs))
        df = to_stream_df(spark, xs)
        got = [r["value"] for r in compile_batch(sp, df).orderBy("seq").collect()]
        assert got == want, f"spec={spec}"
