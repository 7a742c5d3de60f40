"""Behavioral port of the reference's hics example (examples/hics.rs):
demand-driven measure-on-demand control (SURVEY §3 entry point 3).

The meter is a Put-only rspl generator whose emitted value reads the
mutable environment at demand time (read_out, hics.rs:176-186); the
strategy pulls one measurement per loop iteration — tail() FIRST, so the
arm-time element is skipped (hics.rs:80-82) — and the controller emits
signals until |heat_index - reference| < ε (hics.rs:89-91). Environment
actuation is applied synchronously for determinism (the reference's
actuator thread, serialized).
"""

from __future__ import annotations

import itertools

from rspl_spark.dsl.core import Put, eval_sp

# hics.rs:116-141
EPSILON = 0.5
REFERENCE_DAY = 91.0
MINIMAL_TEMPERATURE = 80.0
MINIMAL_HUMIDITY = 50.0
INITIAL = (87.0, 72.0)
ACTUATOR_DECREASE = (0.25, 1.5)


def heat_index(t: float, r: float) -> float:
    """Rothfusz regression (hics.rs:195-218; the public NWS formula)."""
    return (
        -42.379
        + 2.04901523 * t
        + 10.14333127 * r
        - 0.22475541 * t * r
        - 0.00683783 * t * t
        - 0.05481717 * r * r
        + 0.00122874 * t * t * r
        + 0.00085282 * t * r * r
        - 0.00000199 * t * t * r * r
    )


def run_hics():
    env = {"t": INITIAL[0], "r": INITIAL[1]}

    def read_out():
        # Put value computed when the thunk is forced = demand-time read.
        return Put((env["t"], env["r"]), read_out)

    positions = eval_sp(read_out(), itertools.repeat(()))
    next(positions)  # positions.tail() before first head (hics.rs:80-82)

    signals = []
    for _ in range(10_000):  # bounded (reference loops unboundedly)
        t, r = next(positions)
        status = heat_index(t, r)
        deviation = status - REFERENCE_DAY
        if abs(deviation) < EPSILON:
            break
        signals.append(("show", status))
        if deviation > 0.0:
            if r > MINIMAL_HUMIDITY:
                signals.append(("dehumidify",))
                env["r"] -= ACTUATOR_DECREASE[1]  # actuator, serialized
            elif t > MINIMAL_TEMPERATURE:
                signals.append(("cool",))
                env["t"] -= ACTUATOR_DECREASE[0]
    return signals, env


def test_hics_converges():
    signals, env = run_hics()
    final = heat_index(env["t"], env["r"])
    assert abs(final - REFERENCE_DAY) < EPSILON  # the ε-stop (hics.rs:89-91)
    shows = [s[1] for s in signals if s[0] == "show"]
    assert len(shows) > 1
    # monotone approach from above with the dehumidify/cool actuation
    assert shows == sorted(shows, reverse=True)
    assert shows[0] > REFERENCE_DAY


def test_hics_dehumidify_before_cool():
    """Controller policy (hics.rs:221-235): dehumidify while humidity >
    minimum; only then cool."""
    signals, env = run_hics()
    kinds = [s[0] for s in signals if s[0] != "show"]
    if "cool" in kinds:
        first_cool = kinds.index("cool")
        assert all(k == "dehumidify" for k in kinds[:first_cool])
    # humidity actuated down but respecting the policy boundary region
    assert env["r"] <= INITIAL[1]


def test_hics_meter_reads_demand_time():
    """The generator must observe environment mutations between pulls —
    the read_out semantics (hics.rs:176-186), not a frozen snapshot."""
    env = {"v": 0}

    def read_out():
        return Put(env["v"], read_out)

    gen = eval_sp(read_out(), itertools.repeat(()))
    first = next(gen)
    env["v"] = 42
    second = next(gen)
    assert (first, second) == (0, 42)


def test_hics_deterministic():
    assert run_hics() == run_hics()
