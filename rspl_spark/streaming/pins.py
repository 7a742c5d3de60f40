"""Pinned-behaviors registry: Spark-INTERNAL semantics our oracles or
exactly-once contracts REPLAY rather than cross-check per run.

Some gates encode Spark internals directly in their DuckDB oracles
(the adversarial watermark gates replay the drop rule) or in their
storage contracts (the agg-store merge trusts foreachBatch's batch_id
replay identity). Those rules are verified EMPIRICALLY, per Spark
major.minor, by dedicated pytest pins — but a Spark upgrade could
silently move a boundary, leaving a green-looking gate checking a
stale rule. So every such behavior is registered here with the
versions its pin test has verified, and each gate calls
:func:`require_pinned` first: an unverified version fails LOUDLY with
the re-verification recipe instead of gating against a possibly-stale
replay (r12 verdict ask #3, generalized from the ad-hoc watermark pin
per r13 verdict ask #7).

Adding a version: run the behavior's ``verified_by`` test file on the
new Spark, then append its major.minor to ``versions`` here.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

PINNED_BEHAVIORS: dict[str, dict] = {
    # WatermarkPropagator drop rule, replayed verbatim by the
    # adversarial oracles (queries/streaming_queries.py docstring):
    # watermark = ms-floored max event time − delay; late FILTERING in
    # batch N uses batch N−1's watermark (one behind eviction); a row
    # drops iff event time <= bound (non-strict); append-mode emits a
    # group iff window end <= eviction watermark (equality emits).
    "watermark-mechanics": {
        "versions": ("4.1",),
        "verified_by": "tests/test_00_watermark_mechanics_pin.py",
        "gates": ("q_stream_late_data", "q_session_window_append"),
    },
    # session_window merge rule: rows within gap merge ACROSS
    # micro-batches into one session identical to batch sessionization,
    # and closure/eviction follows window-end <= watermark. The
    # complete-mode gates cross-check the merged RESULT against the
    # batch oracle every run, but append-mode closure replays the
    # eviction boundary in SQL — same class as watermark-mechanics.
    "session-window-merge": {
        "versions": ("4.1",),
        "verified_by": (
            "tests/test_00_watermark_mechanics_pin.py (emit-on-equality) + "
            "tests/test_streaming_extra.py::"
            "test_session_window_stream_merges_across_batches"
        ),
        "gates": (
            "q_session_window_stream",
            "q_session_window_dynamic_stream",
            "q_session_window_append",
        ),
    },
    # foreachBatch exactly-once contract the agg-store merge builds on:
    # a replayed micro-batch re-presents the SAME batch_id with the
    # SAME rows (WAL offsets), so the (checkpoint-identity, batch_id)
    # record committed atomically with the data makes the fold
    # idempotent. If an upgrade changed batch-id assignment on restart,
    # the merge would double-fold silently.
    "foreachbatch-batch-identity": {
        "versions": ("4.1",),
        "verified_by": (
            "tests/test_streaming_parity.py::"
            "test_stream_merge_batch_replay_is_idempotent (+ the "
            "identity-guard and propless-rewrite tests beside it)"
        ),
        "gates": ("q_stream_merge_store",),
    },
}


def require_pinned(spark: SparkSession, behavior: str) -> None:
    """Fail loudly if this Spark's ``behavior`` internals are unverified.

    Cheap insurance: refuse to gate on an unpinned major.minor instead
    of gating against a possibly-stale replay of Spark internals.
    """
    spec = PINNED_BEHAVIORS[behavior]  # KeyError = caller typo, fine
    mm = ".".join(spark.version.split(".")[:2])
    if mm not in spec["versions"]:
        raise RuntimeError(
            f"pinned behavior {behavior!r} is verified on Spark "
            f"{spec['versions']} but this session runs {spark.version}: "
            f"re-run {spec['verified_by']} on this version, then add "
            f"its major.minor to PINNED_BEHAVIORS[{behavior!r}] "
            "(rspl_spark/streaming/pins.py)"
        )
