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


def test_simhash_banding_complete_on_random_docs(spark):
    """Pigeonhole property, checked empirically: the 2×16-bit banded
    equi-join finds EXACTLY the hamming≤1 pairs that an all-pairs scan
    finds — banding is candidate pruning, never recall loss."""
    import itertools
    import random

    from pyspark.sql import functions as F

    from rspl_spark.operators.dedup import simhash

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
        for i in range(100)
    ]
    # guaranteed collisions: simhash is order-insensitive over distinct
    # tokens, so a token-permuted copy has hamming 0 to its source
    for i in range(100, 120):
        toks = docs[i - 100][1].split()
        rng.shuffle(toks)
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sig), 2)
        if bin(sig[a] ^ sig[b]).count("1") <= 1
    }

    sh = simhash(df)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bv"),
                    )
                    for i in range(2)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bv")
    a, b = bands.alias("a"), bands.alias("b")
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 1)
        .distinct()
        .collect()
    }
    assert banded == brute
    assert brute  # random short docs over a small vocab must collide
