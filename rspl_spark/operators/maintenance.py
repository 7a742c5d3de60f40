"""Table-maintenance operators: small-file compaction.

Streaming file sinks and per-increment appends accumulate many small
parquet files; at 100 TB the file count itself becomes the bottleneck
(driver-side listing, scheduler overhead of one task per tiny split,
metadata pressure on the namenode/object store). Compaction rewrites a
directory into ~target-size files — the routine maintenance pass every
lakehouse runs.

Local-filesystem directory swap is atomic-enough (two renames); an
object-store deployment would write to a staging prefix and flip a
manifest instead — same read/rewrite plan, different commit. The
rewrite itself is fully distributed: one scan + one round-robin
repartition, no driver materialization.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def parquet_dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) over the directory's parquet files."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
    zorder_cols: list[str] | None = None,
) -> dict:
    """Rewrite a flat parquet directory into ``ceil(bytes / target)``
    files. No-op (returns the stats unchanged) when the directory
    already has fewer than ``min_files`` data files.

    ``zorder_cols`` re-CLUSTERS while compacting: the rewrite orders
    rows by the Morton key of the named columns
    (:func:`rspl_spark.operators.layout.zorder_layout`), so the one
    shuffle every compaction already pays also restores multi-dimension
    row-group skipping that per-increment appends destroy. This is the
    standard "OPTIMIZE ... ZORDER BY" maintenance shape.

    Streaming-sink caveat: a directory with a ``_spark_metadata`` file-
    sink log is refused — compaction would orphan the exactly-once log;
    stop the query and copy the data out (or read via path, not log)
    first. Partitioned layouts: compact each leaf partition directory
    (this keeps partition pruning intact and bounds each rewrite).

    Returns {files_before, files_after, bytes}.
    """
    if target_file_bytes <= 0:
        raise ValueError("target_file_bytes must be positive")
    if not os.path.isdir(path):
        # a missing dir is either a typo or the documented rename crash
        # window (data parked in .__old_*/.__compact_* siblings) — a
        # success-shaped {0, 0, 0} return would mask both
        raise ValueError(
            f"compact_parquet: {path} is not a directory (mistyped path,"
            " or a crashed compaction left the data in .__old_* /"
            " .__compact_* siblings — recover those first)"
        )
    if any(
        "=" in d and os.path.isdir(os.path.join(path, d))
        for d in os.listdir(path)
    ):
        raise ValueError(
            f"compact_parquet: {path} holds key=value partition"
            " directories; compacting the root would flatten the Hive"
            " layout (partition columns become data columns, pruning"
            " dies) — compact each leaf partition directory instead"
        )
    if os.path.isdir(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is a streaming file-sink output (_spark_metadata present); "
            "compacting would orphan the sink's exactly-once log"
        )
    n_before, total = parquet_dir_stats(path)
    if n_before < min_files:
        return {"files_before": n_before, "files_after": n_before, "bytes": total}
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    tmp = f"{path.rstrip('/')}.__compact_{uuid.uuid4().hex[:8]}"
    # repartition (round-robin), NOT coalesce: coalesce glues existing
    # splits together unevenly and can collapse upstream parallelism;
    # the rebalance costs one shuffle and yields uniform output files.
    df = spark.read.parquet(path)
    if zorder_cols:
        from rspl_spark.operators.layout import zorder_layout

        df = zorder_layout(df, zorder_cols, int(n_out))
    else:
        df = df.repartition(int(n_out))
    df.write.mode("overwrite").parquet(tmp)
    bak = f"{path.rstrip('/')}.__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, bak)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(bak, path)  # roll back; leave tmp for inspection
        raise
    shutil.rmtree(bak, ignore_errors=True)
    n_after, total_after = parquet_dir_stats(path)
    return {"files_before": n_before, "files_after": n_after, "bytes": total_after}
