"""In-pytest slice of the driver's correctness gate: a representative
query from every family, Spark vs DuckDB at sf0.001. (The full 83-query
sweep is tools/check_oracle.py; this keeps `pytest` self-contained.)"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

from rspl_spark.catalog import TABLES
from rspl_spark.queries import load_registry

SF = "/root/testdata/sf0.001"

REPRESENTATIVES = [
    "q1_pricing_summary",     # scan-filter-agg
    "q3_shipping_priority",   # multi-join + top-k
    "q_asof_join",            # as-of window
    "q_rollup",               # grouping analytics
    "q_window_rank",          # ranking windows
    "q_dsl_map_filter",       # compiled DSL
    "q_dsl_fsm_keyed",        # interpreted DSL vs recursive-CTE oracle
    "q_minhash_lsh_pairs",    # LSH dedup
    "q_cosine_topk_ivf",      # ANN
    "q_tfidf_top_terms",      # text analysis
    "q_dedup_clusters",       # iterative graph op
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_gate_representative(spark, duck, name):
    reg = load_registry()
    spec = reg[name]
    sdf = _canon(spec.fn(spark, SF).toPandas())
    assert spec.oracle is not None, f"{name} should be oracle-checked"
    ddf = _canon(duck.sql(spec.oracle).df())
    assert len(sdf) == len(ddf), f"rowcount {len(sdf)} != {len(ddf)}"
    assert list(sdf.columns) == list(ddf.columns)
    assert _h(sdf) == _h(ddf), f"value hash mismatch for {name}"
