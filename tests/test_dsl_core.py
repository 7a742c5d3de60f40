"""Pure-Python DSL parity with the reference's own tests (no Spark).

Expected values come from the reference's integration tests:
- tests/basic.rs   — bind/alternate/sp_aux pipeline over 0,1,2,…,6
- tests/demands.rs — Babylonian √2, BBP π, Euler e; golden 12.077005857
- tests/events.rs  — shift-key Mealy machine, 9 runs until first false
- tests/load.rs    — filter(is_even)∘map(factorial)∘map(+1) shape
"""

from __future__ import annotations

import itertools
import math

from rspl_spark.dsl import (
    Get,
    Put,
    alternate,
    bind,
    compose,
    eval_sp,
    filter_sp,
    generate,
    map_sp,
)


def take(sp, stream, n):
    return list(itertools.islice(eval_sp(sp, stream), n))


def test_map_filter_compose():
    # load.rs:24 pipeline shape: filter(is_even) ∘ map(factorial) ∘ map(+1)
    sp = compose(
        compose(filter_sp(lambda n: n % 2 == 0), map_sp(math.factorial)),
        map_sp(lambda n: n + 1),
    )
    assert take(sp, range(10), 5) == [
        math.factorial(0) + 1,
        math.factorial(2) + 1,
        math.factorial(4) + 1,
        math.factorial(6) + 1,
        math.factorial(8) + 1,
    ]


def test_basic_rs_pipeline():
    """tests/basic.rs:9-56 — expected output prefix 2,4,1,5,5 (head 2,
    second 4, then print 3 and the rest starts with 5)."""

    def sp_aux():
        # get two elements, emit them swapped, then identity
        return Get(
            lambda n1: Get(
                lambda n2: Put(n2, lambda: Put(n1, lambda: map_sp(lambda x: x)))
            )
        )

    sp = bind(
        map_sp(lambda n: n == 0),
        lambda b: alternate(sp_aux(), map_sp(lambda n: n + 1))
        if b
        else map_sp(lambda x: x),
    )
    out = take(sp, [0, 1, 2, 3, 4, 5, 6], 5)
    assert out[0] == 2  # result.head()
    assert out[1] == 4  # result.tail().head()
    assert out[4] == 5  # after print(_, 3), rest.head()
    assert out == [2, 4, 1, 5, 5]


def test_basic_rs_bind_other_branch():
    sp = bind(
        map_sp(lambda n: n == 0),
        lambda b: alternate(
            Get(lambda n1: Get(lambda n2: Put(n2, lambda: Put(n1, lambda: map_sp(lambda x: x))))),
            map_sp(lambda n: n + 1),
        )
        if b
        else map_sp(lambda x: x),
    )
    # Nonzero first element → identity on the remainder.
    assert take(sp, [7, 1, 2, 3], 3) == [1, 2, 3]


def test_demands_rs_golden():
    """tests/demands.rs:6-51 — √2·π·e ≈ 12.077005857 within 1e-3, with the
    same step counts (10/5/10) via `generate` state-passing."""
    babylon2 = generate(lambda x: (x, (x + 2.0 / x) / 2.0), 1.0)

    def bbp_body(state):
        partial, k = state
        term = (1.0 / 16.0**k) * (
            4.0 / (8 * k + 1) - 2.0 / (8 * k + 4) - 1.0 / (8 * k + 5) - 1.0 / (8 * k + 6)
        )
        return partial, (partial + term, k + 1)

    bbp = generate(bbp_body, (0.0, 0))

    def euler_body(state):
        partial, k, kfac = state
        return partial, (partial + 1.0 / kfac, k + 1, kfac * (k + 1))

    euler = generate(euler_body, (1.0, 1, 1))

    unit = itertools.repeat(())  # InfiniteList::constant(())
    sqrt2 = take(babylon2, unit, 11)[10]
    pi = take(bbp, itertools.repeat(()), 6)[5]
    e = take(euler, itertools.repeat(()), 11)[10]
    assert abs(sqrt2 * pi * e - 12.077005857) < 1e-3


def test_events_rs_fsm():
    """tests/events.rs — shift-key Mealy machine; 9 outputs before the
    first False (RUNS_REFERENCE = 9)."""

    def key_action(c):
        return c != 0

    def default():
        def transition(event):
            kind = event[0]
            if kind == "shift_down":
                return Put(True, shifted)
            if kind == "shift_up":
                return default()
            return Put(key_action(event[1]), default)

        return Get(transition)

    def shifted():
        def transition(event):
            kind = event[0]
            if kind == "shift_down":
                return shifted()
            if kind == "shift_up":
                return Put(True, default)
            return Put(key_action(event[1]), shifted)

        return Get(transition)

    events = [
        ("shift_up",),  # channel seed (overeager_receivers.rs:29-32)
        ("key", 1),
        ("shift_down",),
        ("key", 1),
        ("key", 5),
        ("shift_up",),
        ("key", 5),
        ("key", 7),
        ("shift_up",),
        ("key", 3),
        ("shift_down",),
        ("key", 0),
    ]
    runs = 0
    for out in eval_sp(default(), events):
        if not out:
            break
        runs += 1
    assert runs == 9


def test_alternate_reference_doctest():
    """combinators.rs:226-238 — alternate(filter(>0), filter(<0)) over seed
    0 then 1,2,-1,-2,1 yields 1,-1,1."""
    sp = alternate(filter_sp(lambda n: n > 0), filter_sp(lambda n: n < 0))
    assert take(sp, [0, 1, 2, -1, -2, 1], 3) == [1, -1, 1]


def test_bind_value_not_emitted():
    """combinators.rs:43-47: the bound value selects the continuation but
    is not part of the output."""
    sp = bind(map_sp(lambda x: x * 100), lambda v: map_sp(lambda x: x + v))
    # First element 1 → v=100 (not emitted); rest get +100.
    assert take(sp, [1, 2, 3], 2) == [102, 103]


def test_generate_ignores_input():
    """combinators.rs:156-176: generate emits regardless of input; the
    0,1,2 cycle example."""
    sp = generate(lambda s: (s, (s + 1) % 3), 0)
    assert take(sp, itertools.repeat(()), 7) == [0, 1, 2, 0, 1, 2, 0]


def test_nested_alternate():
    """alternate nests: the outer alternation interleaves the inner
    machine's emissions with the third branch, per-output-element."""
    inner = alternate(map_sp(lambda x: ("a", x)), map_sp(lambda x: ("b", x)))
    sp = alternate(inner, map_sp(lambda x: ("c", x)))
    out = take(sp, range(6), 6)
    # outer alternates after every emission; inner alternates between its
    # own branches each time control returns to it.
    assert out == [
        ("a", 0), ("c", 1), ("b", 2), ("c", 3), ("a", 4), ("c", 5),
    ]


def test_bind_chaining():
    """bind of bind: each head's first emission is consumed to select the
    next stage (monadic sequencing, combinators.rs:43-73)."""
    sp = bind(
        map_sp(lambda x: x * 10),
        lambda a: bind(
            map_sp(lambda x: x + a),
            lambda b: map_sp(lambda x: x * 1000 + a + b),
        ),
    )
    # input 1,2,3,4: a = 10 (from 1, consumed), b = 2+10=12 (from 2,
    # consumed), rest mapped with a=10, b=12.
    assert take(sp, [1, 2, 3, 4], 2) == [3022, 4022]


def test_alternate_inside_compose():
    """compose(alternate(...), map): downstream transform applies to the
    interleaved stream."""
    sp = compose(
        alternate(filter_sp(lambda n: n > 0), filter_sp(lambda n: n < 0)),
        map_sp(lambda n: n * 2),
    )
    assert take(sp, [0, 1, 2, -1, -2, 1], 3) == [2, -2, 2]


def test_trampoline_stack_safety():
    """src/lib.rs:253-256: evaluation must be loop-based — 1M elements
    through a compose chain without recursion errors."""
    sp = compose(filter_sp(lambda n: n % 2 == 0), map_sp(lambda n: n + 1))
    n = sum(1 for _ in eval_sp(sp, range(1_000_000)))
    assert n == 500_000


def test_compose_put_only_downstream_documented_deviation():
    """Pins the DOCUMENTED deviation from src/combinators.rs:101-120
    (see ComposeSP.step): a downstream Put that cannot depend on input
    is emitted even when upstream demands input, so
    compose(map(f), generate(..)) emits the generator's output on an
    empty input (the reference's operational order would produce
    nothing there). take()-bounding is the consumer's obligation for
    Put-only downstream terms — identical to the reference's own
    obligation on its necessarily-infinite streams."""
    sp = compose(map_sp(lambda x: x + 1), generate(lambda s: (s, s + 1), 0))
    assert take(sp, [], 5) == [0, 1, 2, 3, 4]
    # On infinite (sufficient) input the two branch orders agree on
    # values — the generator output is input-independent either way.
    assert take(sp, itertools.count(), 5) == [0, 1, 2, 3, 4]


def test_compose_put_put_preserves_upstream_pending():
    """Put/Put: downstream emits first; upstream's pending Put stays
    queued and is delivered when downstream next Gets — value order
    identical to the reference's Put/Put branch."""
    up = Put(7, lambda: map_sp(lambda x: x))
    down = Put(99, lambda: map_sp(lambda x: x * 2))
    # up wants to emit 7; down emits 99 first, then Gets -> receives 7.
    assert take(compose(up, down), [5], 3) == [99, 14, 10]


def test_compose_emits_all_determined_outputs_on_finite_prefix():
    """Maximal-prefix property the micro-batch residual semantics rely
    on: every output determined by the consumed input is emitted (the
    reference's order would strand trailing outputs behind a Get)."""
    sp = compose(filter_sp(lambda n: n % 2 == 0), map_sp(lambda n: n * 10))
    assert take(sp, range(10), 100) == [0, 20, 40, 60, 80]


def test_bind_chain_is_stack_safe():
    """A DEEP chain of Put-headed binds resolved within a single step()
    (FSM-states-as-binds with no intervening Get) must not grow the
    Python stack — 100k chained selections used to RecursionError."""
    from rspl_spark.dsl import Get, Put, bind, generate

    def echo():
        return Get(lambda a: Put(a, echo))

    def state(n):
        if n >= 100_000:
            return echo()
        # Put-headed bind selecting the next bind directly: the whole
        # 100k-deep selection chain unfolds inside ONE step() call
        return bind(generate(lambda s: (s, s + 1), n + 1), state)

    out = list(itertools.islice(eval_sp(state(0), itertools.repeat(7)), 3))
    assert out == [7, 7, 7]
