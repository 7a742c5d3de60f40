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
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.operators.similarity import pq_adc_topk, pq_encode, pq_fit


def _refresh(spark: SparkSession, name: str) -> None:
    """Invalidate cached plans/file listings after a physical change.

    Index tables are dropped, re-created at the SAME warehouse path,
    compact-swapped, and appended to within one long-lived session;
    Spark's relation cache and shared file-status cache are keyed by
    name/path, so without an explicit REFRESH a later probe can plan
    against part-files a swap or rebuild just deleted
    (FAILED_READ_FILE.FILE_NOT_EXIST — the r14 lifecycle-fuzz flake).
    Same discipline as ``agg_store._refresh_store``."""
    try:
        spark.sql(f"REFRESH TABLE {name}")
    except Exception:
        pass


def _props(spark: SparkSession, name: str) -> dict[str, str]:
    return {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {name}").collect()
    }


def _set_props(spark: SparkSession, name: str, props: dict[str, str]) -> None:
    # _sql_str: a quoted value (tag="client's batch") must not break the
    # ALTER statement — especially on the compaction recovery path,
    # which re-sets ALL props to restore the pre-failure state
    from rspl_spark.operators.agg_store import _sql_str

    kv = ", ".join(
        f"'{_sql_str(k)}'='{_sql_str(v)}'" for k, v in props.items()
    )
    spark.sql(f"ALTER TABLE {name} SET TBLPROPERTIES ({kv})")


def _check_increment_dim(
    new_vecs: DataFrame, vec_col: str, expect_dim: int, kind: str
) -> None:
    """Fail fast on a wrong-dimension increment. Without this, a
    mismatched append silently corrupts the index: zip_with over
    unequal-length arrays yields NULL dots, so every SRP bit defaults
    to 0 and IVF/PQ cell assignment becomes arbitrary. One-row driver
    check (limit-1 scan of the increment), never a full pass."""
    row = new_vecs.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is not None and row["d"] != expect_dim:
        raise ValueError(
            f"{kind} append: increment vector dim {row['d']} != "
            f"stored index dim {expect_dim}"
        )


def _deleted_name(name: str) -> str:
    return f"{name}__deleted"


def _check_increment_not_tombstoned(
    spark: SparkSession, name: str, new_vecs: DataFrame, id_col: str, kind: str
) -> None:
    """Fail fast when an increment re-uses a currently-tombstoned id.

    With id-keyed tombstones there is NO correct silent behavior for a
    re-append: keeping the tombstone hides the new row (the probe
    anti-join can't tell old from new), and clearing it resurrects the
    stale physical row alongside the new one (duplicate id, possibly a
    different vector). Both corrupt answers silently, so the collision
    is the caller's to resolve: ``compact_index`` first (physically
    removes the old row and clears the tombstone), then append.

    Cost: one semi-join of the increment's keys against the broadcast
    tombstone sidecar (metadata-sized) — never a pass over the index.
    """
    dead = _tombstones(spark, name)
    if dead is None:
        return
    hit = (
        new_vecs.select(F.col(id_col).cast("long").alias("vec_id"))
        .join(F.broadcast(dead), "vec_id", "left_semi")
        .take(3)
    )
    if hit:
        ids = sorted(r["vec_id"] for r in hit)
        raise ValueError(
            f"{kind} append: increment contains tombstoned ids "
            f"(e.g. {ids}); a tombstone would silently hide the "
            f"re-appended rows. Run compact_index('{name}') first, "
            f"then append."
        )


def _warehouse_path(spark: SparkSession, table: str) -> str:
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    if warehouse.startswith("file:"):
        warehouse = warehouse[len("file:") :]
    return os.path.join(os.path.abspath(warehouse), table.lower())


def _tombstones(spark: SparkSession, name: str, key_col: str = "vec_id") -> DataFrame | None:
    """The persisted tombstone set, or None. Tombstones OUTLIVE the
    session (a takedown must not silently resurrect when the driver
    restarts): the sidecar is an EXTERNAL parquet table, and a fresh
    catalog that finds its directory on disk re-registers it here."""
    dn = _deleted_name(name)
    if spark.catalog.tableExists(dn):
        return spark.table(dn)
    path = _warehouse_path(spark, dn)
    if os.path.isdir(path):
        spark.sql(
            f"CREATE TABLE {dn} ({key_col} BIGINT) USING PARQUET LOCATION '{path}'"
        )
        return spark.table(dn)
    return None


def live_rows(spark: SparkSession, name: str) -> DataFrame:
    """The index table minus tombstoned vec_ids — the view every probe
    (and any external consumer of the index table) should read so
    takedowns are honored. The tombstone set is
    key-only (metadata-sized next to a corpus-sized index), so the
    anti join broadcasts and preserves the stored table's partitioning
    — the probe plans gain no Exchange from delete support."""
    tbl = spark.table(name)
    dead = _tombstones(spark, name)
    if dead is not None:
        tbl = tbl.join(F.broadcast(dead), "vec_id", "left_anti")
    return tbl


def delete_keys(
    spark: SparkSession,
    name: str,
    vec_ids,
) -> int:
    """Retract vectors from a persisted index (pq/ivf/srp alike) by
    tombstone: append the ids to a key-only sidecar table that every
    probe anti-joins out. Takedown/opt-out compliance path.

    The delete itself writes ONLY the tombstone file — zero index data
    files are rewritten (asserted in tests/test_ann_store.py), so a
    delete over a 100 TB index costs a metadata write, not a rewrite.
    Physical removal is deferred to :func:`compact_index` (or the next
    ``refresh_*``/``create_*(overwrite=True)`` rebuild, which clears
    the tombstones — a fresh build defines a fresh membership).

    ``vec_ids``: iterable of ids or a single-column DataFrame. Returns
    the number of tombstones appended (repeat deletes are idempotent —
    already-tombstoned ids are skipped)."""
    if isinstance(vec_ids, DataFrame):
        ids = vec_ids.select(F.col(vec_ids.columns[0]).cast("long").alias("vec_id"))
    else:
        ids = spark.createDataFrame([(int(v),) for v in vec_ids], "vec_id long")
    ids = ids.distinct()
    dn = _deleted_name(name)
    existing = _tombstones(spark, name)
    if existing is not None:
        ids = ids.join(F.broadcast(existing), "vec_id", "left_anti")
    ids = ids.localCheckpoint()
    n = ids.count()
    if n:
        writer = ids.coalesce(1).write.mode("append").format("parquet")
        if not spark.catalog.tableExists(dn):
            writer = writer.option("path", _warehouse_path(spark, dn))
        writer.saveAsTable(dn)
        _refresh(spark, dn)
    return n


def deleted_count(spark: SparkSession, name: str) -> int:
    dead = _tombstones(spark, name)
    return dead.count() if dead is not None else 0


def _drop_tombstones(spark: SparkSession, name: str) -> None:
    """Remove the tombstone table AND its on-disk directory — called
    only when the index itself is rebuilt/compacted, i.e. the new
    membership supersedes the tombstones."""
    spark.sql(f"DROP TABLE IF EXISTS {_deleted_name(name)}")
    path = _warehouse_path(spark, _deleted_name(name))
    if os.path.isdir(path):
        import shutil

        shutil.rmtree(path, ignore_errors=True)


def compact_index(spark: SparkSession, name: str) -> int:
    """Physically remove tombstoned rows: rewrite the surviving rows
    under the same name/layout, clear the tombstone table, reset the
    row counters. Run when deleted_count/base_rows crosses a policy
    threshold — the rewrite costs one pass over the index (the same
    cost class as refresh, minus the refit).

    Returns the surviving row count. Trained state (codebooks/
    centroids/planes config) is preserved verbatim — compaction never
    refits."""
    # Crash-safe: survivors go to a VERSIONED tmp table while the index
    # (and its files) are still intact, then the catalog entry swaps and
    # the superseded directory is reaped — the agg_store._rewrite_swap
    # discipline. A write failure mid-compaction leaves the original
    # index and tombstones untouched; only the DROP→RENAME window needs
    # the re-register fallback, and both data dirs still exist then.
    import shutil
    import uuid

    from rspl_spark.operators.agg_store import (
        _reap_stale_compactions,
        _table_location,
    )

    # a PREVIOUS failed compaction leaves its tmp table/dir behind (for
    # post-mortem inspection); reap those now so repeated failures can't
    # accumulate unreaped warehouse directories
    _reap_stale_compactions(spark, name, _warehouse_path(spark, name))
    props = _props(spark, name)
    if "pq.codebooks" in props:
        kind, part_keys = "pq", []
    elif "ivf.centroids" in props:
        kind, part_keys = "ivf", ["cid"]
    else:
        kind, part_keys = "srp", ["band", "bv"]
    old_path = _table_location(spark, name)
    live = live_rows(spark, name)
    ver = uuid.uuid4().hex[:8]
    tmp_name = f"{name}__compact_{ver}"
    tmp_path = f"{_warehouse_path(spark, name)}.__v_{ver}"
    # preserve the layout the index was created with (recorded at
    # create time) — a hardcoded 32 shrank big indexes and ballooned
    # small ones on every compaction
    n_parts = int(props.get(f"{kind}.n_partitions", "32"))
    writer = (
        live.repartition(n_parts, *part_keys)
        if part_keys
        else live.repartition(n_parts)
    ).write.mode("overwrite").format("parquet").option("path", tmp_path)
    writer.saveAsTable(tmp_name)
    n = spark.table(tmp_name).count()
    spark.sql(f"DROP TABLE {name}")
    try:
        spark.sql(f"ALTER TABLE {tmp_name} RENAME TO {name}")
    except Exception:
        # re-register the ORIGINAL data under the index name so the
        # table never vanishes; the compacted tmp stays for inspection
        if old_path:
            schema = spark.read.parquet(old_path).schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING PARQUET LOCATION '{old_path}'"
            )
            _set_props(spark, name, props)
            _refresh(spark, name)
        raise
    _refresh(spark, name)
    keep = {k: v for k, v in props.items() if k.startswith(f"{kind}.")}
    keep[f"{kind}.base_rows"] = str(n)
    keep[f"{kind}.appended_rows"] = "0"
    _set_props(spark, name, keep)
    if (
        old_path
        and os.path.realpath(old_path) != os.path.realpath(tmp_path)
        and os.path.isdir(old_path)
    ):
        shutil.rmtree(old_path, ignore_errors=True)
    _drop_tombstones(spark, name)
    return n


def _fresh_table_path(spark: SparkSession, name: str) -> str:
    """A clean on-disk location for a (re)built index table, derived
    from the session's configured warehouse (NOT this module's file
    location): a session pointed elsewhere must get its index there."""
    path = _warehouse_path(spark, name)
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    return path


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
    # a fresh build defines a fresh membership — stale tombstones from
    # the previous build must not shadow re-ingested ids
    _drop_tombstones(spark, name)
    path = _fresh_table_path(spark, name)
    cbs = pq_fit(df, vec_col=vec_col, id_col=id_col, m=m, k=k, iters=iters)
    enc = pq_encode(df, cbs, vec_col=vec_col, id_col=id_col)
    if id_col != "vec_id":
        # the persisted table's id column is ALWAYS vec_id — the
        # tombstone machinery (live_rows/delete_keys) joins on it, and
        # IVF/SRP already normalize via unit_prep; a caller id name
        # surviving to disk broke every PQ delete/compact/probe
        enc = enc.withColumnRenamed(id_col, "vec_id")
    (
        enc.repartition(n_partitions)
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(name)
    )
    _refresh(spark, name)
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
            "pq.n_partitions": str(n_partitions),
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
    _check_increment_dim(new_vecs, vec_col, len(cbs) * len(cbs[0][0]), "pq")
    _check_increment_not_tombstoned(spark, name, new_vecs, id_col, "pq")
    # count the INCREMENT, not the table: two corpus-sized table counts
    # per daily append would dwarf the append itself at a large index.
    # localCheckpoint materializes the (increment-sized) encoding once
    # for both the count and the write.
    enc = pq_encode(new_vecs, cbs, vec_col=vec_col, id_col=id_col)
    if id_col != "vec_id":
        enc = enc.withColumnRenamed(id_col, "vec_id")  # stored name, always
    enc = enc.localCheckpoint()
    n = enc.count()
    enc.write.mode("append").format("parquet").saveAsTable(name)
    _refresh(spark, name)
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
    codebooks — same kernel and semantics as similarity.pq_adc_topk.
    Tombstoned vec_ids (``delete_keys``) are filtered out."""
    return pq_adc_topk(
        live_rows(spark, name),
        pq_index_codebooks(spark, name),
        queries,
        topk=topk,
        id_col=id_col,
    )


# --- Persisted IVF index ----------------------------------------------------
#
# Same maintenance contract as the PQ index: trained state (the k*d
# centroid matrix) in TBLPROPERTIES, the data-sized half (unit-prepped
# vectors + their cell assignment) as an append-only managed parquet
# table. Increments are assigned with the STORED centroids (assignment
# is a pure function of the centroids), staleness tracks drift, refit
# rebuilds. Query = probe n_probe nearest cells against the stored
# centroids, scan ONLY those cells of the table — the candidate set
# shrinks by ~cells/probes and the cell id keys the shuffle.


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _centroid_frame(spark: SparkSession, centroids: list[list[float]]) -> DataFrame:
    cent = spark.createDataFrame(
        [(ci, [float(x) for x in c]) for ci, c in enumerate(centroids)],
        "cid long, cemb array<double>",
    )
    cnrm = F.sqrt(F.aggregate(F.col("cemb"), F.lit(0.0), lambda s, v: s + v * v))
    return cent.select("cid", "cemb", cnrm.alias("cnrm"))


def _rank_cells(prep: DataFrame, centp: DataFrame, id_col: str, n_keep: int) -> DataFrame:
    """(id, emb, nrm, cid) for each row's n_keep most-cosine-similar
    cells: broadcast the (tiny) centroid frame, window-rank per row.
    Pure codegen — one dot product per (row, cell)."""
    csim = (
        _dot(F.col("emb"), F.col("cemb")) / F.nullif(F.col("nrm") * F.col("cnrm"), F.lit(0.0))
    ).alias("csim")
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("cid"))
    return (
        prep.crossJoin(F.broadcast(centp))
        .select(id_col, "emb", "nrm", "cid", csim)
        .withColumn("crk", F.row_number().over(w))
        .filter(F.col("crk") <= n_keep)
        .select(id_col, "emb", "nrm", "cid")
    )


def create_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    overwrite: bool = False,
    tag: str = "base",
    n_partitions: int = 32,
) -> str:
    """Train centroids on ``df`` (Lloyd k-means, deterministic init),
    assign every vector to its nearest-by-cosine cell, persist the
    assigned unit-prepped table + the centroids in TBLPROPERTIES.

    Idempotent unless ``overwrite`` — stored centroids win, because a
    silent refit would strand every assignment row on disk."""
    from rspl_spark.operators.similarity import kmeans_fit, unit_prep

    if spark.catalog.tableExists(name):
        if not overwrite:
            return name
        spark.sql(f"DROP TABLE {name}")
    # a fresh build defines a fresh membership — stale tombstones from
    # the previous build must not shadow re-ingested ids
    _drop_tombstones(spark, name)
    path = _fresh_table_path(spark, name)
    cents = kmeans_fit(df, vec_col=vec_col, id_col=id_col, k=k, iters=iters)
    prep = unit_prep(df, "vec_id", "emb", "nrm", vec_col=vec_col, id_col=id_col)
    assigned = _rank_cells(prep, _centroid_frame(spark, cents), "vec_id", 1)
    (
        assigned.repartition(n_partitions, "cid")
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(name)
    )
    _refresh(spark, name)
    base_rows = spark.table(name).count()
    _set_props(
        spark,
        name,
        {
            "ivf.centroids": json.dumps(cents),
            "ivf.k": str(k),
            "ivf.iters": str(iters),
            "ivf.base_rows": str(base_rows),
            "ivf.appended_rows": "0",
            "ivf.n_partitions": str(n_partitions),
            "ivf.tag": tag,
        },
    )
    return name


def ivf_index_centroids(spark: SparkSession, name: str) -> list[list[float]]:
    """The stored centroid matrix — one catalog call, exact float
    round-trip (json repr), no data files touched."""
    return json.loads(_props(spark, name)["ivf.centroids"])


def append_ivf_index(
    spark: SparkSession,
    new_vecs: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tag: str | None = None,
) -> int:
    """Assign the increment with the STORED centroids and append —
    append-only files, no rewrite, the increment is the only data
    scanned."""
    from rspl_spark.operators.similarity import unit_prep

    cents = ivf_index_centroids(spark, name)
    _check_increment_dim(new_vecs, vec_col, len(cents[0]), "ivf")
    _check_increment_not_tombstoned(spark, name, new_vecs, id_col, "ivf")
    prep = unit_prep(new_vecs, "vec_id", "emb", "nrm", vec_col=vec_col, id_col=id_col)
    assigned = _rank_cells(prep, _centroid_frame(spark, cents), "vec_id", 1).localCheckpoint()
    n = assigned.count()
    assigned.write.mode("append").format("parquet").saveAsTable(name)
    _refresh(spark, name)
    props = _props(spark, name)
    upd = {"ivf.appended_rows": str(int(props.get("ivf.appended_rows", "0")) + n)}
    if tag is not None:
        upd["ivf.tag"] = tag
    _set_props(spark, name, upd)
    return n


def ivf_index_staleness(spark: SparkSession, name: str) -> float:
    p = _props(spark, name)
    base = int(p.get("ivf.base_rows", "0"))
    return int(p.get("ivf.appended_rows", "0")) / max(base, 1)


def refresh_ivf_index(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    stale_threshold: float = 0.5,
    tag: str = "refit",
    **fit_kw,
) -> bool:
    """Refit-on-drift: past the threshold, retrain on the CURRENT full
    corpus and rewrite assignments. Returns True iff a refit ran."""
    if ivf_index_staleness(spark, name) < stale_threshold:
        return False
    p = _props(spark, name)
    create_ivf_index(
        spark,
        df,
        name,
        k=int(p["ivf.k"]),
        iters=int(p["ivf.iters"]),
        overwrite=True,
        tag=tag,
        **fit_kw,
    )
    return True


def ivf_index_topk(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    topk: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, score, rk): exact cosine top-k within the
    n_probe stored cells nearest each query. The centroid probe is a
    broadcast; the cell join hits only the probed cells' partitions
    (the table is written partitioned-by-cid-hash)."""
    from rspl_spark.operators.similarity import unit_prep

    cents = ivf_index_centroids(spark, name)
    qprep = unit_prep(queries, "query_id", "q_emb", "q_nrm", vec_col=vec_col, id_col=id_col)
    probes = _rank_cells(
        qprep.select(F.col("query_id"), F.col("q_emb").alias("emb"), F.col("q_nrm").alias("nrm")),
        _centroid_frame(spark, cents),
        "query_id",
        n_probe,
    ).select("query_id", F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm"), "cid")
    cand = probes.join(live_rows(spark, name), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_score"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id",
            "vec_id",
            (_dot(F.col("q_emb"), F.col("emb")) / F.nullif(F.col("q_nrm") * F.col("nrm"), F.lit(0.0))).alias("raw_score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


# --- Persisted SRP band index -----------------------------------------------
#
# SRP needs no training — the hyperplanes are a pure function of
# (plane index, dim) — so the persisted state is just the band table
# plus the generation CONFIG in TBLPROPERTIES (planes/bands/dim pin
# the hash family; an append encoded under different config would
# silently never collide with existing buckets). Appends re-derive the
# planes from config; no staleness dimension exists, but tag/row
# accounting matches the other stores.


def srp_signs(p: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane p (Knuth-multiply hash — linear
    correlation between planes is fine for bucket-then-rerank; see
    similarity.rp_signs for the isometry-grade mixer)."""
    return [
        1 if ((p * dim + d) * 2654435761 % 4294967296) >> 31 else -1
        for d in range(dim)
    ]


def srp_sketch_col(emb: Column, planes: int, dim: int) -> Column:
    """planes-bit SRP sketch as a long: bit p = (dot(emb, plane_p) >= 0)."""
    dbl = F.transform(emb, lambda x: x.cast("double"))
    bits = None
    for p in range(planes):
        signs = F.array(*[F.lit(float(s)) for s in srp_signs(p, dim)])
        bit = F.when(_dot(dbl, signs) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("long")


def _srp_band_rows(
    df: DataFrame,
    planes: int,
    dim: int,
    bands: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    from rspl_spark.operators.similarity import unit_prep

    band_bits = planes // bands
    prep = unit_prep(df, "vec_id", "emb", "nrm", vec_col=vec_col, id_col=id_col)
    sk = prep.withColumn("sketch", srp_sketch_col(F.col("emb"), planes, dim))
    return sk.select(
        "vec_id",
        "emb",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sketch", band_bits * b)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "emb", "nrm", "b.band", "b.bv")


def create_srp_index(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    planes: int = 16,
    bands: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    overwrite: bool = False,
    tag: str = "base",
    n_partitions: int = 32,
) -> str:
    """Persist the exploded (vec_id, band, bv) table with unit-prepped
    vectors, config in TBLPROPERTIES. planes must divide by bands."""
    if planes % bands:
        raise ValueError("planes must be divisible by bands")
    if spark.catalog.tableExists(name):
        if not overwrite:
            return name
        spark.sql(f"DROP TABLE {name}")
    # a fresh build defines a fresh membership — stale tombstones from
    # the previous build must not shadow re-ingested ids
    _drop_tombstones(spark, name)
    path = _fresh_table_path(spark, name)
    rows = _srp_band_rows(df, planes, dim, bands, vec_col, id_col)
    (
        rows.repartition(n_partitions, "band", "bv")
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .saveAsTable(name)
    )
    _refresh(spark, name)
    base_rows = spark.table(name).count()
    _set_props(
        spark,
        name,
        {
            "srp.planes": str(planes),
            "srp.bands": str(bands),
            "srp.dim": str(dim),
            "srp.base_rows": str(base_rows),
            "srp.appended_rows": "0",
            "srp.n_partitions": str(n_partitions),
            "srp.tag": tag,
        },
    )
    return name


def srp_index_config(spark: SparkSession, name: str) -> dict[str, int]:
    p = _props(spark, name)
    return {k: int(p[f"srp.{k}"]) for k in ("planes", "bands", "dim")}


def append_srp_index(
    spark: SparkSession,
    new_vecs: DataFrame,
    name: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tag: str | None = None,
) -> int:
    """Band the increment under the STORED config and append."""
    cfg = srp_index_config(spark, name)
    _check_increment_dim(new_vecs, vec_col, cfg["dim"], "srp")
    _check_increment_not_tombstoned(spark, name, new_vecs, id_col, "srp")
    rows = _srp_band_rows(
        new_vecs, cfg["planes"], cfg["dim"], cfg["bands"], vec_col, id_col
    ).localCheckpoint()
    n = rows.count()
    rows.write.mode("append").format("parquet").saveAsTable(name)
    _refresh(spark, name)
    props = _props(spark, name)
    upd = {"srp.appended_rows": str(int(props.get("srp.appended_rows", "0")) + n)}
    if tag is not None:
        upd["srp.tag"] = tag
    _set_props(spark, name, upd)
    return n


def srp_index_topk(
    spark: SparkSession,
    name: str,
    queries: DataFrame,
    topk: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(query_id, vec_id, score, rk): exact cosine rerank of stored
    vectors sharing >= 1 band value with the query. The band join keys
    the shuffle; candidates dedup before scoring."""
    from rspl_spark.operators.similarity import unit_prep

    cfg = srp_index_config(spark, name)
    qb = _srp_band_rows(
        queries, cfg["planes"], cfg["dim"], cfg["bands"], vec_col, id_col
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "band",
        "bv",
    )
    cand = (
        qb.join(live_rows(spark, name), ["band", "bv"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "q_emb", "q_nrm", "vec_id", "emb", "nrm")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_score"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id",
            "vec_id",
            (_dot(F.col("q_emb"), F.col("emb")) / F.nullif(F.col("q_nrm") * F.col("nrm"), F.lit(0.0))).alias("raw_score"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= topk)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


# internal name kept for existing callers/tests
_live_rows = live_rows
