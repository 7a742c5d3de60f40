"""Persisted PQ-ADC index: fit once, append increments, query forever.

The in-session PQ path (:mod:`rspl_spark.operators.similarity`) refits
and re-encodes per session — fine for a notebook, wrong for a pipeline
that ingests daily embedding batches into a corpus-sized index. This
module persists BOTH halves of the index once:

- the code table (vec_id, codes) as a managed parquet table — the
  64x-compressed representation the ADC kernel scans;
- the trained codebooks (m * k * sub floats) in the table's
  TBLPROPERTIES as JSON — metadata-sized, loaded driver-side in one
  catalog call, no data read.

Increments are encoded with the STORED codebooks (encoding is a pure
function of the codebooks) and appended as new parquet files — no
refit, no rewrite of existing files. Codebooks drift as the corpus
grows; ``pq_index_staleness`` tracks appended/base rows and
``refresh_pq_index`` refits when the ratio crosses a threshold — the
same maintenance contract as the dedup signature store
(operators/dedup_store.py) and the incremental agg store.

Mirrors the reference's operator-as-persistent-pipeline posture; the
ADC/recall semantics are identical to similarity.pq_* (shared code).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.operators.similarity import pq_adc_topk, pq_encode, pq_fit


def _props(spark: SparkSession, name: str) -> dict[str, str]:
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }


def _set_props(spark: SparkSession, name: str, props: dict[str, str]) -> None:
    kv = ", ".join(f"'{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({kv})")


def create_pq_index(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    overwrite: bool = False,
    tag: str = "base",
    n_partitions: int = 32,
) -> str:
    """Fit codebooks on ``df``, encode it, persist code table + books.

    Idempotent unless ``overwrite``: an existing table is reused as-is
    (its stored codebooks win — refitting silently would invalidate
    every code row already on disk). ``tag`` names the build state so
    callers can recognize an index built by an earlier session
    (``pq_index_tag``) instead of rebuilding."""
    if spark.catalog.tableExists(name):
        if not overwrite:
            return name
        spark.sql(f"DROP TABLE {name}")
    # Respect the session's configured warehouse (NOT this module's file
    # location): a session pointed elsewhere must get its index there.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    path = os.path.join(os.path.abspath(warehouse), name.lower())
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    cbs = pq_fit(df, vec_col=vec_col, id_col=id_col, m=m, k=k, iters=iters)
    enc = pq_encode(df, cbs, vec_col=vec_col, id_col=id_col)
    (
        enc.repartition(n_partitions)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(name)
    )
    base_rows = spark.table(name).count()
    _set_props(
        spark,
        name,
        {
            "pq.codebooks": json.dumps(cbs),
            "pq.m": str(m),
            "pq.k": str(k),
            "pq.iters": str(iters),
            "pq.base_rows": str(base_rows),
            "pq.appended_rows": "0",
            "pq.tag": tag,
        },
    )
    return name


def pq_index_codebooks(spark: SparkSession, name: str) -> list[list[list[float]]]:
    """The stored codebooks — one catalog call, exact float round-trip
    (json repr), no data files touched."""
    return json.loads(_props(spark, name)["pq.codebooks"])


def pq_index_tag(spark: SparkSession, name: str) -> str | None:
    if not spark.catalog.tableExists(name):
        return None
    return _props(spark, name).get("pq.tag")


def append_pq_index(
    spark: SparkSession,
    new_vecs: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tag: str | None = None,
) -> int:
    """Encode the increment with the STORED codebooks and append.

    Append-only parquet files — existing codes never rewritten. Returns
    the appended row count (also accumulated in pq.appended_rows, the
    staleness numerator)."""
    cbs = pq_index_codebooks(spark, name)
    # count the INCREMENT, not the table: two corpus-sized table counts
    # per daily append would dwarf the append itself at a large index.
    # localCheckpoint materializes the (increment-sized) encoding once
    # for both the count and the write.
    enc = pq_encode(new_vecs, cbs, vec_col=vec_col, id_col=id_col).localCheckpoint()
    n = enc.count()
    enc.write.mode("append").format("parquet").saveAsTable(name)
    props = _props(spark, name)
    upd = {"pq.appended_rows": str(int(props.get("pq.appended_rows", "0")) + n)}
    if tag is not None:
        upd["pq.tag"] = tag
    _set_props(spark, name, upd)
    return n


def pq_index_staleness(spark: SparkSession, name: str) -> float:
    """appended_rows / base_rows — how far the corpus has drifted from
    the codebooks' training set."""
    p = _props(spark, name)
    base = int(p.get("pq.base_rows", "0"))
    return int(p.get("pq.appended_rows", "0")) / max(base, 1)


def refresh_pq_index(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    stale_threshold: float = 0.5,
    tag: str = "refit",
    **fit_kw,
) -> bool:
    """Refit-on-drift hook: when staleness crosses the threshold,
    rebuild the index from ``df`` (the CURRENT full corpus) — new
    codebooks, full re-encode, one rewrite. Returns True iff a refit
    ran. A pipeline calls this after each append; most days it's a
    metadata no-op."""
    if pq_index_staleness(spark, name) < stale_threshold:
        return False
    p = _props(spark, name)
    create_pq_index(
        spark,
        df,
        name,
        m=int(p["pq.m"]),
        k=int(p["pq.k"]),
        iters=int(p["pq.iters"]),
        overwrite=True,
        tag=tag,
        **fit_kw,
    )
    return True


def pq_index_topk(
    spark: SparkSession,
    name: str,
    queries: list[tuple[int, list[float]]],
    topk: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the persisted code table with the stored
    codebooks — same kernel and semantics as similarity.pq_adc_topk."""
    return pq_adc_topk(
        spark.table(name),
        pq_index_codebooks(spark, name),
        queries,
        topk=topk,
        id_col=id_col,
    )
