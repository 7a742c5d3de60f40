"""Streaming LLM-pipeline operators: near-duplicate detection over a
document stream.

``streaming_lsh_dedup``: each arriving document's MinHash signature is
computed as a codegen'd expression (same portable kernel as batch), then
exploded into LSH band rows; a stateful op keyed by (band, h1, h2) keeps
the signatures seen in that bucket and emits a candidate pair whenever a
new arrival collides with any of them. State per bucket is tiny (the
few colliding docs' signatures); the bucket key distributes uniformly —
the same shuffle discipline as the batch LSH join, but incremental.
"""

from __future__ import annotations

import pickle

from collections.abc import Iterable

import pandas as pd
from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, StructField, StructType

from rspl_spark.operators.dedup import MINHASH_COEFS, minhash_cols, minhash_sig
from rspl_spark.operators.dedup import shingle_combine, portable_hash, MERSENNE_P

_N = len(MINHASH_COEFS)
_BUCKET_STATE = StructType([StructField("seen", BinaryType())])


def _signatures(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    th = F.transform(toks, lambda t: portable_hash(t) % MERSENNE_P)
    return (
        docs.select(F.col(id_col).alias("doc_id"), th.alias("th"))
        .select("doc_id", shingle_combine(F.col("th")).alias("sh"))
        .select("doc_id", minhash_sig(F.col("sh")).alias("sig"))
        .select("doc_id", *minhash_cols(F.col("sig")))
    )


def streaming_lsh_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) pairs, emitted incrementally.

    doc_a is the previously seen document, doc_b the new arrival; pairs
    below ``threshold`` (estimated Jaccard = matching signature slots /
    slots) are suppressed. A pair colliding in several buckets may be
    emitted once per bucket — downstream consumers dedup by (a, b), as
    the batch formulation does with its final groupBy.
    """
    per_band = _N // n_bands
    sig = _signatures(docs, text_col, id_col)
    bands = None
    for band in range(n_bands):
        part = sig.select(
            "doc_id",
            *[f"mh{j}" for j in range(_N)],
            F.concat_ws(
                ":",
                F.lit(band),
                F.col(f"mh{per_band * band}"),
                F.col(f"mh{per_band * band + 1}"),
            ).alias("bucket"),
        )
        bands = part if bands is None else bands.unionByName(part)

    out_schema = "doc_a long, doc_b long, est_jaccard double"

    def proc(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        seen: list[tuple] = pickle.loads(state.get[0]) if state.exists else []
        pairs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for row in pdf.itertuples(index=False):
                new_sig = tuple(getattr(row, f"mh{j}") for j in range(_N))
                for old_id, old_sig in seen:
                    if old_id == row.doc_id:
                        continue
                    est = sum(a == b for a, b in zip(old_sig, new_sig)) / _N
                    if est >= threshold:
                        a, b = sorted((old_id, row.doc_id))
                        pairs.append((a, b, est))
                seen.append((row.doc_id, new_sig))
        state.update((cloudpickle.dumps(seen),))
        if pairs:
            yield pd.DataFrame(pairs, columns=["doc_a", "doc_b", "est_jaccard"])

    return bands.groupBy("bucket").applyInPandasWithState(
        proc,
        outputStructType=out_schema,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
