"""Degenerate-input hardening: empty, whitespace-only, and single-token
documents must flow through every text/dedup operator without raising —
under ANSI mode (Spark 4 default) an unguarded division kills the whole
job, and a 100 TB corpus WILL contain empty documents."""

from __future__ import annotations

import pytest

from rspl_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    simhash,
    with_hashed_shingles,
)
from rspl_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    text_stats,
    tfidf_top_terms,
)

ROWS = [(0, ""), (1, "   "), (2, "x"), (3, "a a a a a"), (4, "\t\n "), (5, "normal text here")]


@pytest.fixture(scope="module")
def degenerate(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


@pytest.mark.parametrize(
    "op",
    [text_stats, quality_score, language_id, fingerprint, simhash,
     minhash_signatures, with_hashed_shingles, exact_dedup, tfidf_top_terms],
    ids=lambda f: f.__name__,
)
def test_op_survives_degenerate_text(spark, degenerate, op):
    rows = op(degenerate).collect()
    assert rows  # produced output, raised nothing


def test_empty_text_stats_are_null_not_error(spark, degenerate):
    out = {r["doc_id"]: r for r in text_stats(degenerate).collect()}
    assert out[0]["nonspace_ratio"] is None  # undefined, not a crash
    assert out[5]["nonspace_ratio"] is not None
