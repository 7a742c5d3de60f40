"""Regression: the adaptive semantic-dedup gate's SAMPLED-FIT path vs
its DuckDB oracle.

Past the adaptive-k cap (n // target_cell > max_k, n > 2048 rows for
the gate's parameters) ``semantic_dedup`` fits centroids on a
deterministic md5-hash sample (kmeans_fit sample_frac path). The r14
sf1 sweep caught the oracle fitting on ALL rows instead — the driver
testdata tops out at 2000 embeddings (sf0.01), just under the trigger,
so every smaller scale passed while sf1 diverged (one boundary vector
landed in a different cell → one cluster/keep flip). This test crosses
the trigger at pytest scale: 3000 synthetic 16-dim vectors with
injected exact-direction duplicates, gate function vs registry oracle,
full canonical value-hash — the same comparison the driver runs.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rspl_spark.queries import load_registry

N, DIM = 3000, 16


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    rng = np.random.default_rng(1234)
    emb = rng.normal(size=(N, DIM)).astype(np.float32)
    # inject near-duplicates: every 30th vector is a scaled copy of the
    # previous one (cosine exactly 1 before float noise) so clusters
    # exist regardless of the threshold constant
    for i in range(30, N, 30):
        emb[i] = emb[i - 1] * 1.05
    d = tmp_path_factory.mktemp("sd_sampled")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(N, dtype=np.int64)),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
                "label": pa.array(np.zeros(N, dtype=np.int32)),
            }
        ),
        os.path.join(str(d), "embeddings.parquet"),
    )
    return str(d)


def test_adaptive_gate_crosses_sampled_fit_trigger(corpus_dir):
    # the gate's parameters must actually trigger sampling at this n —
    # otherwise the test silently stops covering the sampled path
    from rspl_spark.queries.llm_ops import (
        _SD_ADAPTIVE_MAX_K,
        _SD_ADAPTIVE_TARGET_CELL,
    )

    assert N // _SD_ADAPTIVE_TARGET_CELL > _SD_ADAPTIVE_MAX_K


def test_adaptive_gate_matches_oracle_past_trigger(spark, corpus_dir):
    spec = load_registry()["q_semantic_dedup_adaptive"]
    sdf = _canon(spec.fn(spark, corpus_dir).toPandas())
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{corpus_dir}/embeddings.parquet'"
    )
    ddf = _canon(con.sql(spec.oracle).df())
    assert len(sdf) == N and len(ddf) == N
    assert list(sdf.columns) == list(ddf.columns)
    hs = hashlib.md5(sdf.to_csv(index=False).encode()).hexdigest()
    hd = hashlib.md5(ddf.to_csv(index=False).encode()).hexdigest()
    # value-identical including every cluster/keep decision: the oracle
    # must replay the md5 fit-sample, not fit on all rows
    assert hs == hd, "sampled-fit divergence between engine and oracle"
