"""The reference's own doctest examples, ported 1:1 — the executable
behavior spec (CONTRIBUTING.md mandates one doc-test per public API;
examples at src/combinators.rs:15-30, 49-64, 82-96, 128-142, 162-176,
190-204 and src/lib.rs:236-248)."""

from __future__ import annotations

import itertools

from rspl_spark.dsl import alternate, bind, compose, eval_sp, filter_sp, generate, map_sp


def take(sp, stream, n):
    return list(itertools.islice(eval_sp(sp, stream), n))


def test_doctest_alternate_negate_every_other():
    """combinators.rs:15-30: negate a stream of bools in every other
    position — alternate(map id, map negate) over constant(true)."""
    sp = alternate(map_sp(lambda b: b), map_sp(lambda b: not b))
    assert take(sp, itertools.repeat(True), 6) == [True, False, True, False, True, False]


def test_doctest_bind_flip_signs_by_head():
    """combinators.rs:49-64: flip signs in the tail depending on whether
    the head is zero — bind(map is_zero, maybe_flip_sign) over ones."""
    maybe_flip = lambda b: map_sp(lambda n: -n) if b else map_sp(lambda n: n)
    sp = bind(map_sp(lambda n: n == 0), maybe_flip)
    # constant ones: head 1 ≠ 0 → identity on the tail
    assert take(sp, itertools.repeat(1), 3) == [1, 1, 1]
    # a zero-headed stream → negation of the tail
    sp2 = bind(map_sp(lambda n: n == 0), maybe_flip)
    assert take(sp2, [0, 1, 1, 1], 3) == [-1, -1, -1]


def test_doctest_compose_double_negation():
    """combinators.rs:82-96: double-negate a stream of bools ≡ identity."""
    negate = map_sp(lambda b: not b)
    sp = compose(negate, map_sp(lambda b: not b))
    assert take(sp, itertools.repeat(True), 4) == [True, True, True, True]


def test_doctest_filter_remove_zeros():
    """combinators.rs:128-142: remove the 0s from a stream of integers."""
    sp = filter_sp(lambda n: n > 0)
    assert take(sp, itertools.cycle([1, 0]), 5) == [1, 1, 1, 1, 1]


def test_doctest_generate_mod3_cycle():
    """combinators.rs:162-176: generate the stream 0,1,2,0,1,2,0,…"""
    sp = generate(lambda n: (n % 3, n + 1), 0)
    assert take(sp, itertools.repeat(()), 7) == [0, 1, 2, 0, 1, 2, 0]


def test_doctest_map_negate():
    """combinators.rs:190-204: negate a stream of bools."""
    sp = map_sp(lambda b: not b)
    assert take(sp, itertools.repeat(True), 3) == [False, False, False]


def test_libdoc_negate_get_put():
    """src/lib.rs:236-248: the hand-rolled negate machine
    (get(b → put(!b, negate)))."""
    from rspl_spark.dsl.core import Get, Put

    def negate():
        return Get(lambda b: Put(not b, negate))

    assert take(negate(), itertools.repeat(True), 4) == [False] * 4


def test_lib_test_eval_sorting_machine():
    """src/lib.rs:310-330 test_eval: emit the seed, then read two and
    emit them max-first; seed 0 then [1, 2] → 0, 2, 1."""
    from rspl_spark.dsl.core import Get, Put

    def sp():
        return Get(
            lambda n: Put(
                n,
                lambda: Get(
                    lambda n1: Get(
                        lambda n2: Put(n2, lambda: Put(n1, lambda: map_sp(lambda x: x)))
                        if n1 < n2
                        else Put(n1, lambda: Put(n2, lambda: map_sp(lambda x: x)))
                    )
                ),
            )
        )

    # channel seed 0, then enqueue [1, 2] (lib.rs:318-320)
    out = take(sp(), [0, 1, 2], 3)
    assert out[0] == 0          # assert_head_eq!(result, 0)
    assert out[1:] == [2, 1]    # assert_tail_starts_with!(result, [2, 1])


def test_lib_test_eval_panic_propagates():
    """src/lib.rs:333-343 test_eval_panic: an exception inside a
    transition propagates out of evaluation (no silent swallowing)."""
    import pytest

    from rspl_spark.dsl.core import Get, Put

    def boom(b):
        raise RuntimeError("panic")

    sp = Get(lambda b: Put(boom(b) if b else b, lambda: map_sp(lambda x: x)))
    with pytest.raises(RuntimeError):
        take(sp, itertools.repeat(True), 1)
