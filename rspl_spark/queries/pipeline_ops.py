"""Pipeline-operations gates (round 8, session 2): PSI drift, SCD
Type-2 dimension maintenance, trigram-similarity fuzzy join, int8
quantized ANN search, ORC source/sink roundtrip.

Same determinism discipline as the rest of the registry (see
queries/__init__.py): explicit ORDER BY on a unique key, floats rounded
in-query, integer arithmetic wherever accumulation order could differ,
identical aliases on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.queries import query

# ---------------------------------------------------------------------------
# PSI drift: click-vs-error event-value distributions, 16 equal-width
# bins over the pooled min/max, Laplace smoothing 0.5. KS (q_ks_drift)
# is the max-gap monitor; PSI is the magnitude monitor — a broad small
# shift that hides from KS still accumulates bin-by-bin here. The only
# float steps per bin are one division and one ln (both correctly
# rounded IEEE ops) — round(6) absorbs ≤1-ulp engine drift.
# ---------------------------------------------------------------------------

_PSI_BINS = 16
_PSI_S = 0.5

_PSI_CTES = f"""
WITH pooled AS (
  SELECT CAST(value AS DOUBLE) AS v,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS a,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS b
  FROM events WHERE event_type IN ('click', 'error')
),
mm AS (
  SELECT MIN(v) AS mn,
         CASE WHEN MAX(v) = MIN(v) THEN 1.0 ELSE MAX(v) - MIN(v) END AS span
  FROM pooled
),
cnt AS (
  SELECT CAST(LEAST(FLOOR((v - mn) * {_PSI_BINS} / span), {_PSI_BINS - 1}) AS BIGINT) AS bin,
         SUM(a) AS c_a, SUM(b) AS c_b
  FROM pooled CROSS JOIN mm
  GROUP BY 1
),
spine AS (SELECT CAST(UNNEST(GENERATE_SERIES(0, {_PSI_BINS - 1})) AS BIGINT) AS bin),
full_bins AS (
  SELECT s.bin,
         CAST(COALESCE(c.c_a, 0) AS BIGINT) AS c_a,
         CAST(COALESCE(c.c_b, 0) AS BIGINT) AS c_b
  FROM spine s LEFT JOIN cnt c ON s.bin = c.bin
),
tot AS (
  SELECT CAST(SUM(c_a) AS BIGINT) AS n_a, CAST(SUM(c_b) AS BIGINT) AS n_b
  FROM full_bins
),
contrib AS (
  SELECT bin, c_a, c_b, n_a, n_b,
         ((c_a + {_PSI_S}) / (n_a + {_PSI_S * _PSI_BINS})
          - (c_b + {_PSI_S}) / (n_b + {_PSI_S * _PSI_BINS}))
         * LN(((c_a + {_PSI_S}) / (n_a + {_PSI_S * _PSI_BINS}))
              / ((c_b + {_PSI_S}) / (n_b + {_PSI_S * _PSI_BINS}))) AS contrib
  FROM full_bins CROSS JOIN tot
)
"""

_PSI_ORACLE = (
    _PSI_CTES
    + """
SELECT ROUND(SUM(contrib), 6) AS psi, n_a, n_b
FROM contrib
GROUP BY n_a, n_b
"""
)

_PSI_BINS_ORACLE = (
    _PSI_CTES
    + """
SELECT bin, c_a, c_b, ROUND(contrib, 6) AS contrib
FROM contrib
ORDER BY bin
"""
)


def _psi_frames(spark: SparkSession, sf_dir: str):
    from rspl_spark.operators.drift import psi_bins

    e = load(spark, sf_dir, "events")
    return psi_bins(
        e,
        "value",
        F.col("event_type") == "click",
        F.col("event_type") == "error",
        bins=_PSI_BINS,
        smoothing=_PSI_S,
    )


@query("q_psi_drift", oracle=_PSI_ORACLE, tags=("llm", "curation", "drift"))
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _psi_frames(spark, sf_dir)
    return (
        b.groupBy("n_a", "n_b")
        .agg(F.round(F.sum("contrib"), 6).alias("psi"))
        .select("psi", "n_a", "n_b")
    )


@query("q_psi_drift_bins", oracle=_PSI_BINS_ORACLE, tags=("llm", "curation", "drift"))
def q_psi_drift_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _psi_frames(spark, sf_dir)
    return b.select(
        "bin", "c_a", "c_b", F.round("contrib", 6).alias("contrib")
    ).orderBy("bin")
