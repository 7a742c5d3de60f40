"""Runtime enablement for the modern transformWithStateInPandas backend.

transformWithStateInPandas (Spark 4) has two environment requirements the
legacy applyInPandasWithState path does not:

1. ``google.protobuf`` — the Python worker talks to the JVM state server
   over protobuf. This container has no protobuf install, but the
   google-cloud-sdk it ships carries a modern pure-Python protobuf
   runtime (6.32.x) under a plain ``google.protobuf`` namespace;
   :func:`enable_tws_runtime` puts it on ``sys.path`` and on
   ``PYTHONPATH`` (executor Python workers inherit the env, so it MUST
   run before the SparkSession is created). pyspark's generated
   StateMessage gencode is 6.33 — same major, one minor ahead of the
   runtime — so protobuf's own escape hatch
   (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``) is set to skip the
   strict minor check; the descriptor wire format is unchanged within a
   major version.

2. RocksDB state store — transformWithState keeps each state variable
   (and its timers) in its own column family, which
   HDFSBackedStateStoreProvider does not support.
   :func:`ensure_rocksdb_state_store` switches the session conf to the
   bundled RocksDB provider (a per-query requirement of the operator,
   not a tuning choice).
"""

from __future__ import annotations

import os
import sys

_VENDORED_PROTOBUF_PARENTS = (
    # google-cloud-sdk's appengine runtime bundles protobuf 6.32 with the
    # standard (non-namespaced) google.protobuf package layout.
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def _protobuf_importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def enable_tws_runtime() -> bool:
    """Make ``google.protobuf`` importable in the driver AND executor
    workers. Call BEFORE creating the SparkSession (workers inherit
    PYTHONPATH from the environment at JVM launch). Returns True when
    the protobuf runtime is available (natively or vendored)."""
    if _protobuf_importable():
        return True
    for parent in _VENDORED_PROTOBUF_PARENTS:
        if not os.path.isdir(os.path.join(parent, "google", "protobuf")):
            continue
        if parent not in sys.path:
            sys.path.insert(0, parent)
        paths = os.environ.get("PYTHONPATH", "")
        if parent not in paths.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                parent + (os.pathsep + paths if paths else "")
            )
        os.environ.setdefault("TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        if _protobuf_importable():
            return True
    return False


def ensure_rocksdb_state_store(spark) -> None:
    """Switch the state store to RocksDB if the default HDFS-backed
    provider is active (transformWithState needs column families)."""
    try:
        cur = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    except Exception:
        cur = None
    if not cur or cur.rsplit(".", 1)[-1] == "HDFSBackedStateStoreProvider":
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)


def enable_tws_runtime_for_session(spark) -> bool:
    """Make the TWS runtime work on an ALREADY-CREATED session.

    :func:`enable_tws_runtime`'s ``PYTHONPATH`` export only reaches
    Python workers if it runs before the JVM launches — a session the
    caller did not create (the correctness driver's vanilla session, a
    notebook kernel) is too late for that route. But PySpark ships
    ``sc.environment`` as per-function worker env vars, and the worker
    pool is keyed on (pythonExec, envVars) — a changed env spawns a
    fresh daemon with it (verified empirically: the TWS query's worker
    imports the vendored protobuf this way on a session created first).
    Returns True when the protobuf runtime is available driver-side
    (natively or vendored); also applies the RocksDB provider conf.
    """
    ok = enable_tws_runtime()
    ensure_rocksdb_state_store(spark)
    if ok:
        try:
            env = spark.sparkContext.environment
        except Exception:  # Spark Connect: no sparkContext; executor
            return ok      # env must be provisioned at cluster setup
        for parent in _VENDORED_PROTOBUF_PARENTS:
            if not os.path.isdir(os.path.join(parent, "google", "protobuf")):
                continue
            # membership must be checked against sc.environment's OWN
            # value — os.environ already holds the parent after
            # enable_tws_runtime(), but os.environ does NOT reach
            # workers of an already-launched JVM; sc.environment does
            paths = env.get("PYTHONPATH", "")
            if parent not in paths.split(os.pathsep):
                env["PYTHONPATH"] = (
                    parent + (os.pathsep + paths if paths else "")
                )
            env.setdefault(
                "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
            )
    return ok
