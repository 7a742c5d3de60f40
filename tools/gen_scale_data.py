"""Deterministic synthetic-data generator for scale sweeps.

Reproduces the driver testdata's schemas and value distributions
(see TESTDATA.md; distributions measured from /root/testdata/sf0.1)
at larger scale factors, so the headline queries can be measured at
sf1+ without touching the read-only driver data. NOT byte-identical
to the driver generator — this is a performance corpus (same
cardinality ratios, selectivities, join fan-outs), not a correctness
oracle; the hash gate stays on the driver's sf0.01 data.

Usage:  python tools/gen_scale_data.py --sf 1 --out .scaledata/sf1

Rows per unit scale factor (10x the observed sf0.1 counts):
lineitem 6M, orders 1.5M, customer 150k, part 200k, supplier 10k,
events 1M, documents 50k, embeddings 20k; region/nation fixed.
Generation is fully vectorized numpy -> pyarrow, seed=42.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["new", "red", "large", "hot", "cold", "small", "blue", "old"]
NOUNS = ["widget", "ring", "gear", "bolt", "plate", "rod", "gizmo", "anvil"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]

DAY_US = 86_400_000_000  # microseconds per day


def _days(rng, n, lo_day: int, hi_day: int) -> np.ndarray:
    """Uniform day-precision timestamps as int64 epoch-us."""
    return rng.integers(lo_day, hi_day + 1, n) * DAY_US


def _ts_col(us: np.ndarray) -> pa.Array:
    return pa.array(us, type=pa.timestamp("us"))


def _write(out: str, name: str, table: pa.Table) -> None:
    # Cap row groups well under Spark's 128MB maxPartitionBytes: Spark
    # assigns file SPLITS by byte range but a split only does work for
    # row groups whose midpoint falls in it — a table written as one
    # big row group runs on ONE task no matter how many splits exist
    # (measured: every documents-based sf10 stage was a 1-straggler
    # "(13+1)/14"). ~32k rows keeps groups at a few MB for every table.
    pq.write_table(
        table, os.path.join(out, f"{name}.parquet"), row_group_size=32768
    )
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    _write(out, "part", pa.table({
        "p_partkey": pk,
        "p_name": [
            f"{ADJS[a]} {NOUNS[b]}"
            for a, b in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
        ],
        "p_brand": np.char.add("Brand#", rng.integers(1, 26, n_part).astype(str)),
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + (pk % 1000) / 10.0, 1),
    }))

    # orders: 1995-01-01 .. 2001-08-01 (day precision)
    d95 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    _write(out, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_col(_days(rng, n_ord, d95, d95 + 2404)),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: l_linenumber drawn independently per row (matches the
    # driver data, where (l_orderkey, l_linenumber) is NOT unique)
    _write(out, "lineitem", pa.table({
        "l_orderkey": rng.integers(0, n_ord, n_li),
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": rng.integers(0, 11, n_li) / 100.0,
        "l_tax": rng.integers(0, 9, n_li) / 100.0,
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": _ts_col(_days(rng, n_li, d95 + 1, d95 + 2499)),
    }))

    # events: 30 days from 2024-01-01, sorted by ts, value ~ exp(50)
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(int)
    ts = np.sort(t0 + rng.integers(0, 30 * DAY_US, n_ev))
    n_users = max(int(15_000 * sf), 1)
    _write(out, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": _ts_col(ts),
        "user_id": rng.integers(0, n_users, n_ev),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev).clip(0, 600), 2),
        "props": np.char.add(
            np.char.add('{"k": ', rng.integers(0, 100, n_ev).astype(str)), "}"
        ),
    }))

    # documents: 10-100 words from the 31-word vocab (tiny vocab ->
    # natural shingle collisions, so LSH/near-dup ops have real work)
    lens = rng.integers(10, 101, n_doc)
    flat = np.array(VOCAB)[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    langs = np.array(["en", "de", "es", "fr", "zh"])[
        rng.choice(5, n_doc, p=[0.41, 0.15, 0.15, 0.15, 0.14])
    ]
    _write(out, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": langs,
        "source": np.char.add("src", (np.arange(n_doc) % 20).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # embeddings: 64-dim unit vectors, 10 gaussian clusters
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": labels.astype(np.int32),
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", type=float, default=1.0)
    p.add_argument("--out", default=None)
    p.add_argument("--seed", type=int, default=42)
    a = p.parse_args()
    out = a.out or f".scaledata/sf{a.sf:g}"
    print(f"generating sf={a.sf} -> {out}")
    generate(a.sf, out, a.seed)


if __name__ == "__main__":
    main()
