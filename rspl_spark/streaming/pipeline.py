"""Streaming training-data curation pipeline: the composed, end-to-end
shape a 100 TB ingest actually runs —

    raw docs ──▶ quality score ──▶ language filter ──▶ exact dedup
                (codegen exprs)     (codegen exprs)     (content-hash in
                                                         keyed state)
               ──▶ curated docs

Quality/language stages are stateless Catalyst expressions (stream-safe
narrow ops); dedup holds seen content-hashes in per-bucket state — the
hash keys the shuffle, so state is uniformly distributed and each bucket
holds only its own hashes.
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

from rspl_spark.operators.text import language_id, quality_score

_SEEN_STATE = StructType([StructField("seen", BinaryType())])


def curate_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    keep_langs: tuple[str, ...] = ("en",),
    n_hash_buckets: int = 64,
) -> DataFrame:
    """(doc_id, text, quality, pred_lang) — documents that pass quality,
    language, and first-seen exact-dedup gates. Streaming frames only
    (the dedup stage is applyInPandasWithState); the batch equivalent is
    operators.text.quality_score/language_id + operators.dedup.exact_dedup.
    """
    q = quality_score(docs, text_col, id_col).select(id_col, "quality")
    lang = language_id(docs, text_col, id_col).select(id_col, "pred_lang")
    scored = (
        docs.select(id_col, text_col)
        .join(q, id_col)
        .join(lang, id_col)
        .filter((F.col("quality") >= min_quality) & F.col("pred_lang").isin(*keep_langs))
        .withColumn("h", F.md5(F.col(text_col)))
        .withColumn("bucket", F.abs(F.hash("h")) % n_hash_buckets)
    )

    out_schema = f"`{id_col}` long, `{text_col}` string, quality double, pred_lang string"

    def dedup(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        seen: set = pickle.loads(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(id_col)
            for r in pdf.itertuples(index=False):
                h = getattr(r, "h")
                if h in seen:
                    continue
                seen.add(h)
                rows.append(
                    (
                        getattr(r, id_col),
                        getattr(r, text_col),
                        getattr(r, "quality"),
                        getattr(r, "pred_lang"),
                    )
                )
        state.update((cloudpickle.dumps(seen),))
        if rows:
            yield pd.DataFrame(rows, columns=[id_col, text_col, "quality", "pred_lang"])

    return scored.groupBy("bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
