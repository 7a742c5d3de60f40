"""Faithful behavioral port of the reference's flagship pelican-crossing
example (examples/pelican.rs): hierarchical FSM with capability outputs
and a timeout feedback loop, driven by a DETERMINISTIC discrete-event
simulation of the reference's thread timing (sleeps become virtual-clock
scheduling; the feedback worker is modeled serially exactly like its
unbounded-channel thread, pelican.rs:350-367).

States/transitions mirror pelican.rs:110-280; constants pelican.rs:57-60;
driver loop pelican.rs:310-337; input simulator pelican.rs:339-367.
"""

from __future__ import annotations

import heapq

from rspl_spark.dsl.core import Get, Put

# pelican.rs:57-60
GREEN_MIN = 10000
YELLOW = 1000
PED_GREEN = 10000
BOTH_RED = 2000

# Capabilities as tuples: ("veh"|"ped", color) | ("timeout_after", ms) |
# ("unexpected", msg) | ("help",) | ("break",)


def _mealy(*caps_then_state):
    *caps, state = caps_then_state
    sp = state
    for cap in reversed(caps):
        sp = Put(cap, (lambda s: lambda: s)(sp))
    return sp


def build_pelican():
    def off():
        return _mealy(("ped", "black"), ("veh", "black"), ("break",), _loop_break())

    def _loop_break():
        return Get(lambda _e: Put(("break",), _loop_break))

    def error():
        return _mealy(("ped", "red"), ("veh", "red"), ("help",), _loop_help())

    def _loop_help():
        return Get(lambda _e: Put(("help",), _loop_help))

    def operational():
        def op_exit():  # shared by all substates (pelican.rs:143-145)
            return off()

        def vehicles():
            def vehicles_green_guard():
                def t(ev):
                    if ev == "push":
                        return vehicles_green_guard()  # ignore!
                    if ev == "timeout":
                        return vehicles_green()
                    return op_exit()

                return Get(t)

            def vehicles_green():
                def t(ev):
                    if ev == "push":
                        return vehicles_green_pushed()
                    if ev == "timeout":
                        return vehicles_green_timedout()
                    return op_exit()

                return _mealy(("veh", "green"), ("timeout_after", GREEN_MIN), Get(t))

            def vehicles_green_pushed():
                def t(ev):
                    if ev == "push":
                        return vehicles_green_pushed()  # ignore!
                    if ev == "timeout":
                        return vehicles_yellow()
                    return op_exit()

                return Get(t)

            def vehicles_green_timedout():
                def t(ev):
                    if ev == "push":
                        return vehicles_yellow()
                    if ev == "timeout":
                        return _mealy(
                            ("unexpected", "state: vehicles_green_timedout"), error()
                        )
                    return op_exit()

                return Get(t)

            def vehicles_yellow():
                def t(ev):
                    if ev == "push":
                        return vehicles_yellow()  # ignore!
                    if ev == "timeout":
                        return pedestrians()
                    return op_exit()

                return _mealy(("veh", "yellow"), ("timeout_after", YELLOW), Get(t))

            return _mealy(
                ("ped", "red"), ("timeout_after", BOTH_RED), vehicles_green_guard()
            )

        def pedestrians():
            def ped_green_guard():
                def t(ev):
                    if ev == "push":
                        return ped_green_guard()  # ignore!
                    if ev == "timeout":
                        return ped_green()
                    return op_exit()

                return Get(t)

            def ped_green():
                def t(ev):
                    if ev == "push":
                        return ped_green()  # ignore!
                    if ev == "timeout":
                        return vehicles()
                    return op_exit()

                return _mealy(("ped", "green"), ("timeout_after", PED_GREEN), Get(t))

            return _mealy(("veh", "red"), ("timeout_after", BOTH_RED), ped_green_guard())

        return vehicles()

    def on():
        return _mealy(("ped", "red"), ("veh", "red"), operational())

    return on()


def drive(machine, external_events):
    """Deterministic discrete-event driver: the virtual-clock analog of
    pelican.rs main(). external_events: [(time_ms, event)]. Returns the
    full capability trace."""
    from rspl_spark.dsl.core import run_prefix

    q = []  # (time, tiebreak, event)
    tick = 0
    for t, ev in external_events:
        heapq.heappush(q, (t, tick, ev))
        tick += 1
    # channel seed (pelican.rs:346: channel(0, Event::Push)) at t=0
    heapq.heappush(q, (-1, -1, "push"))

    trace = []
    worker_free = 0.0  # the serial feedback thread (pelican.rs:350-358)
    now = 0.0
    sp = machine

    def consume_caps(outs):
        nonlocal worker_free
        stop = False
        for cap in outs:
            trace.append(cap)
            if cap[0] == "timeout_after":
                worker_free = max(worker_free, now) + cap[1]
                heapq.heappush(q, (worker_free, tick + len(trace), "timeout"))
            elif cap[0] in ("break", "help"):
                stop = True
                break
        return stop

    # initial Puts before any input (on() lights)
    outs, sp = run_prefix(sp, [])
    if consume_caps(outs):
        return trace
    while q:
        now, _, ev = heapq.heappop(q)
        outs, sp = run_prefix(sp, [ev])
        if consume_caps(outs):
            return trace
    return trace


def _reference_schedule():
    """pelican.rs:360-366: 10 × (sleep 5000, Push; sleep 500, Push), then
    Exit."""
    evs = []
    t = 0
    for _ in range(10):
        t += 5000
        evs.append((t, "push"))
        t += 500
        evs.append((t, "push"))
    evs.append((t, "exit"))
    return evs


def test_pelican_full_run():
    trace = drive(build_pelican(), _reference_schedule())
    # startup: both red, then vehicles phase arms (pelican.rs on()/vehicles())
    assert trace[:4] == [
        ("ped", "red"),
        ("veh", "red"),
        ("ped", "red"),
        ("timeout_after", BOTH_RED),
    ]
    # the crossing actually serves pedestrians at least once
    assert ("ped", "green") in trace
    # and cycles back to a vehicles-green phase more than once
    assert sum(1 for c in trace if c == ("veh", "green")) >= 2
    # no error path in the normal schedule
    assert all(c[0] not in ("unexpected", "help") for c in trace)
    # clean shutdown: off() sequence ends the trace
    assert trace[-3:] == [("ped", "black"), ("veh", "black"), ("break",)]
    # light-safety invariant: vehicles green only while pedestrians red
    ped = veh = None
    for cap in trace:
        if cap[0] == "ped":
            ped = cap[1]
        elif cap[0] == "veh":
            veh = cap[1]
        if veh == "green":
            assert ped == "red"
        if ped == "green":
            assert veh == "red"


def test_pelican_deterministic():
    t1 = drive(build_pelican(), _reference_schedule())
    t2 = drive(build_pelican(), _reference_schedule())
    assert t1 == t2


def test_pelican_exit_immediately():
    trace = drive(build_pelican(), [(1, "exit")])
    assert trace[-3:] == [("ped", "black"), ("veh", "black"), ("break",)]


def test_pelican_double_timeout_is_error():
    """vehicles_green_timedout + another Timeout → UnexpectedTimeout →
    error state (pelican.rs:190-198)."""
    trace = drive(
        build_pelican(),
        [(100000, "timeout")],  # a spurious extra timeout late in green
    )
    assert any(c[0] == "unexpected" for c in trace)
    assert trace[-1] == ("help",)
