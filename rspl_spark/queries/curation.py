"""Corpus-curation gate queries: chunking, source mixing, stratified
sampling, quantile quality cuts, PII scrubbing (operators in
rspl_spark.operators.curation).

Every query replays its full definition in DuckDB SQL — including the
deterministic sampling hash (the same md5-based portable hash the dedup
queries use), so sampling decisions are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.operators import curation as C
from rspl_spark.operators.text import quality_expr
from rspl_spark.queries import query
from rspl_spark.queries.llm_ops import _QUALITY_SQL_EXPR, _sql_hash

# ---------------------------------------------------------------------------
# Document chunking: overlapping 64-token windows, stride 48.
# ---------------------------------------------------------------------------

_CHUNK_ORACLE = """
SELECT doc_id,
       CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
       ARRAY_TO_STRING(LIST_SLICE(toks, s, LEAST(s + 63, LEN(toks))), ' ') AS chunk_text,
       CAST(LEN(LIST_SLICE(toks, s, LEAST(s + 63, LEN(toks)))) AS BIGINT) AS n_chunk_tokens
FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS toks FROM documents) d,
     UNNEST(GENERATE_SERIES(1, GREATEST(LEN(toks), 1), 48)) AS gs(s)
ORDER BY doc_id, chunk_idx
"""


@query("q_chunk_documents", oracle=_CHUNK_ORACLE, tags=("llm", "curation"))
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return C.chunk_tokens(d, window=64, stride=48).orderBy("doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# Deterministic weighted source mixing (hash-Bernoulli thinning).
# Rates are picked so rate*10^6 is exact in binary floating point.
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
_MIX_DEFAULT = 0.125

_MIX_ORACLE = f"""
SELECT doc_id, source, lang
FROM documents
WHERE {_sql_hash("CONCAT_WS(':', source, CAST(doc_id AS VARCHAR))")} % {C.SAMPLE_MOD}
      < CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
                    WHEN 'src2' THEN 250000 WHEN 'src3' THEN 0
                    ELSE 125000 END
ORDER BY doc_id
"""


@query("q_mix_sources", oracle=_MIX_ORACLE, tags=("llm", "curation"))
def q_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        C.mix_sources(d, _MIX_WEIGHTS, _MIX_DEFAULT)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Upsampling source mix: weights > 1 repeat rows (floor(w) full copies +
# a hash-decided fractional extra). The oracle replays the integer
# (full_copies, fractional_ppm) split so no float rounding can drift.
# ---------------------------------------------------------------------------

_MIXUP_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25}
_MIXUP_DEFAULT = 0.5


def _mixup_case_sql() -> tuple[str, str]:
    fulls, ppms = [], []
    for s, w in sorted(_MIXUP_WEIGHTS.items()):
        full, ppm = C._split_weight(w)
        fulls.append(f"WHEN '{s}' THEN {full}")
        ppms.append(f"WHEN '{s}' THEN {ppm}")
    d_full, d_ppm = C._split_weight(_MIXUP_DEFAULT)
    return (
        f"CASE source {' '.join(fulls)} ELSE {d_full} END",
        f"CASE source {' '.join(ppms)} ELSE {d_ppm} END",
    )


_MIXUP_FULL_SQL, _MIXUP_PPM_SQL = _mixup_case_sql()

_MIXUP_ORACLE = f"""
SELECT doc_id, source, lang,
       CAST(UNNEST(GENERATE_SERIES(1, n_copies)) AS BIGINT) AS copy_idx
FROM (
  SELECT doc_id, source, lang,
         ({_MIXUP_FULL_SQL})
         + CASE WHEN {_sql_hash("CONCAT_WS(':', source, CAST(doc_id AS VARCHAR))")} % {C.SAMPLE_MOD}
                     < ({_MIXUP_PPM_SQL})
                THEN 1 ELSE 0 END AS n_copies
  FROM documents
) t
WHERE n_copies >= 1
ORDER BY doc_id, copy_idx
"""


@query("q_mix_sources_upsampled", oracle=_MIXUP_ORACLE, tags=("llm", "curation"))
def q_mix_sources_upsampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        C.mix_sources(d, _MIXUP_WEIGHTS, _MIXUP_DEFAULT)
        .select("doc_id", "source", "lang", "copy_idx")
        .orderBy("doc_id", "copy_idx")
    )


# ---------------------------------------------------------------------------
# Token-length histogram: per (source, 64-token bucket) corpus shape.
# ---------------------------------------------------------------------------

_HIST_ORACLE = """
SELECT source, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       CAST(bucket * 64 AS BIGINT) AS bucket_lo
FROM (SELECT source, CAST(nt // 64 AS BIGINT) AS bucket, nt
      FROM (SELECT source, LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS nt
            FROM documents) raw) t
GROUP BY source, bucket
ORDER BY source, bucket
"""


@query("q_token_length_histogram", oracle=_HIST_ORACLE, tags=("llm", "curation"))
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return C.token_length_histogram(d).orderBy("source", "bucket")


# ---------------------------------------------------------------------------
# Quality-weighted sampling: keep probability = clamp(quality * 1.5, 0, 1),
# hash-decided — high-quality docs survive at a higher rate.
# ---------------------------------------------------------------------------

_QW_SCALE = 1.5

_QWS_ORACLE = f"""
SELECT doc_id, source, ROUND(score, 6) AS score
FROM (SELECT doc_id, source, {_QUALITY_SQL_EXPR} AS score FROM documents) t
WHERE {_sql_hash("CONCAT_WS(':', source, CAST(doc_id AS VARCHAR))")} % {C.SAMPLE_MOD}
      < CAST(ROUND(LEAST(GREATEST(ROUND(score * {_QW_SCALE}, 6), 0), 1) * {C.SAMPLE_MOD}, 0) AS BIGINT)
ORDER BY doc_id
"""


@query("q_quality_weighted_sample", oracle=_QWS_ORACLE, tags=("llm", "curation"))
def q_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        C.quality_weighted_sample(d, quality_expr(), scale=_QW_SCALE)
        .select("doc_id", "source", "score")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (tau = 0.5): the testdata's 20 sources
# are perfectly balanced, so the query first folds src0-src9 into one
# 'web' mega-source (10x the others) — the weights then upsample every
# small source (w ≈ 1.52) and thin 'web' (w ≈ 0.48), scale-invariantly.
# The oracle re-derives the SAME weight arithmetic in SQL, with the
# float plumbing pinned bit-for-bit: the denominator is an ORDERED
# aggregate (SUM ... ORDER BY source — matching temperature_weights'
# sorted-order Python sum, since float addition is order-sensitive) and
# the 3-decimal rounding is the same half-away-from-zero
# FLOOR(x*1000 + 0.5)/1000 on both sides (Python round() is banker's —
# a weight on a .0005 boundary would flip the gate).
# ---------------------------------------------------------------------------

_TEMP_TAU = 0.5
_WEB_SOURCES = tuple(f"src{i}" for i in range(10))
_FOLD_SQL = (
    "CASE WHEN source IN ("
    + ", ".join(f"'{s}'" for s in _WEB_SOURCES)
    + ") THEN 'web' ELSE source END"
)

_TEMP_ORACLE = f"""
WITH folded AS (
  SELECT doc_id, lang, {_FOLD_SQL} AS source FROM documents
),
cnt AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS c FROM folded GROUP BY source),
tot AS (SELECT SUM(c ORDER BY source) AS n,
               SUM(POW(c, {_TEMP_TAU}) ORDER BY source) AS denom FROM cnt),
w AS (
  SELECT source, FLOOR(POW(c, {_TEMP_TAU}) / denom * n / c * 1000.0 + 0.5) / 1000.0 AS w
  FROM cnt, tot
),
sized AS (
  SELECT f.doc_id, f.source, f.lang,
         CAST(FLOOR(w.w) AS BIGINT)
         + CASE WHEN {_sql_hash("CONCAT_WS(':', f.source, CAST(f.doc_id AS VARCHAR))")} % {C.SAMPLE_MOD}
                     < CAST(ROUND((w.w - FLOOR(w.w)) * {C.SAMPLE_MOD}, 0) AS BIGINT)
                THEN 1 ELSE 0 END AS n_copies
  FROM folded f JOIN w ON f.source = w.source
)
SELECT doc_id, source, lang,
       CAST(UNNEST(GENERATE_SERIES(1, n_copies)) AS BIGINT) AS copy_idx
FROM sized
WHERE n_copies >= 1
ORDER BY doc_id, copy_idx
"""


@query("q_mix_temperature", oracle=_TEMP_ORACLE, tags=("llm", "curation", "iterative"))
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    folded = d.select(
        "doc_id",
        "lang",
        F.when(F.col("source").isin(*_WEB_SOURCES), "web")
        .otherwise(F.col("source"))
        .alias("source"),
    )
    weights = C.temperature_weights(folded, tau=_TEMP_TAU)
    return (
        C.mix_sources(folded, weights, default_rate=0.0)
        .select("doc_id", "source", "lang", "copy_idx")
        .orderBy("doc_id", "copy_idx")
    )


# ---------------------------------------------------------------------------
# Stratified sample: exactly 5 docs per language, hash-ranked.
# ---------------------------------------------------------------------------

_STRAT_ORACLE = f"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_sql_hash("CONCAT_WS(':', 'strat', CAST(doc_id AS VARCHAR))")} % {C.SAMPLE_MOD},
                    doc_id
         ) AS rk
  FROM documents
) t
WHERE rk <= 5
ORDER BY doc_id
"""


@query("q_stratified_sample", oracle=_STRAT_ORACLE, tags=("llm", "curation"))
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        C.stratified_sample(d, "lang", 5)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Quantile quality cut: keep the top half of each language by quality
# score; threshold = per-language exact median, broadcast back.
# ---------------------------------------------------------------------------

_QCUT_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang, {_QUALITY_SQL_EXPR} AS score FROM documents
),
cuts AS (
  SELECT lang, QUANTILE_CONT(score, 0.5) AS cut FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.score
FROM scored s JOIN cuts c ON s.lang = c.lang
WHERE s.score >= c.cut
ORDER BY s.doc_id
"""


@query("q_quality_quantile_cut", oracle=_QCUT_ORACLE, tags=("llm", "curation"))
def q_quality_quantile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        C.quality_quantile_cut(d, quality_expr(), "lang", keep_frac=0.5)
        .select("doc_id", "lang", "score")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# PII / noise scrubbing. The synthetic corpus has no real PII, so the
# query injects deterministic emails/URLs/digit-runs first (replayed
# identically in the oracle), then scrubs them back out — the redaction
# actually fires and the hash proves both engines agree on every byte.
# ---------------------------------------------------------------------------


def _inject_spark(text, doc_id):
    t = F.concat(
        text,
        F.when(
            doc_id % 7 == 0,
            F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 11 == 0,
            F.concat(F.lit(" see https://example.org/page/"), doc_id.cast("string")),
        ).otherwise(F.lit("")),
        F.when(doc_id % 13 == 0, F.lit(" ref 1234567890")).otherwise(F.lit("")),
    )
    return t


_INJECT_SQL = """text
  || CASE WHEN doc_id % 7 = 0
          THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
  || CASE WHEN doc_id % 11 = 0
          THEN ' see https://example.org/page/' || CAST(doc_id AS VARCHAR) ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN ' ref 1234567890' ELSE '' END"""

_SCRUB_ORACLE = f"""
SELECT doc_id,
       TRIM(REGEXP_REPLACE(
         REGEXP_REPLACE(
           REGEXP_REPLACE(
             REGEXP_REPLACE(noisy, '{C.EMAIL_RE}', '<EMAIL>', 'g'),
             '{C.URL_RE}', '<URL>', 'g'),
           '{C.LONG_DIGITS_RE}', '<NUM>', 'g'),
         '\\s+', ' ', 'g')) AS clean_text,
       CAST(LEN(REGEXP_EXTRACT_ALL(noisy, '{C.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(noisy, '{C.EMAIL_RE}', '<EMAIL>', 'g'), '{C.URL_RE}')) AS BIGINT) AS n_urls
FROM (SELECT doc_id, {_INJECT_SQL} AS noisy FROM documents) t
ORDER BY doc_id
"""


@query("q_scrub_text", oracle=_SCRUB_ORACLE, tags=("llm", "curation"))
def q_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    noisy = d.select(
        "doc_id", _inject_spark(F.col("text"), F.col("doc_id")).alias("text")
    )
    return C.scrub_text(noisy).orderBy("doc_id")


# Trained quality classifier (distributed logistic regression): the
# model-based quality-filter pattern — train a tiny LR on labeled docs
# (label: lang == 'en'; features: scaled length, space ratio, mean
# token length), then score the whole corpus with a pure codegen
# sigmoid expression. Training is the kmeans_fit partial-sum shape
# (one narrow pass per iteration, model = 4 driver-side floats); the
# oracle replays all three full-batch gradient steps as 1-row weight
# CTEs, so the gate hash-checks the TRAINING, not just the scoring.

_LR_ITERS = 3
_LR_RATE = 1.0

_LR_FEATS_SQL = """
feats AS (
  SELECT doc_id,
         LENGTH(text) / 300.0 AS x0,
         (LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) * 1.0
           / GREATEST(LENGTH(text), 1) AS x1,
         LENGTH(text) * 1.0
           / ((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1) / 10.0 AS x2,
         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
  FROM documents
)"""


def _lr_oracle(iters: int = _LR_ITERS, lr: float = _LR_RATE) -> str:
    parts = [
        "WITH" + _LR_FEATS_SQL + """,
w0 AS (SELECT 0.0 AS a, 0.0 AS b, 0.0 AS c, 0.0 AS bias)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
p{i} AS (
  SELECT f.*, 1.0 / (1.0 + EXP(-(w.bias + f.x0 * w.a + f.x1 * w.b + f.x2 * w.c))) AS p
  FROM feats f CROSS JOIN w{i - 1} w
),
g{i} AS (
  SELECT SUM((y - p) * x0) / COUNT(*) AS ga,
         SUM((y - p) * x1) / COUNT(*) AS gb,
         SUM((y - p) * x2) / COUNT(*) AS gc,
         SUM(y - p) / COUNT(*) AS gbias
  FROM p{i}
),
w{i} AS (
  SELECT w.a + {lr} * g.ga AS a, w.b + {lr} * g.gb AS b,
         w.c + {lr} * g.gc AS c, w.bias + {lr} * g.gbias AS bias
  FROM w{i - 1} w CROSS JOIN g{i} g
)"""
        )
    parts.append(f"""
SELECT doc_id, score,
       CAST(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS pred
FROM (
  SELECT f.doc_id,
         ROUND(1.0 / (1.0 + EXP(-(w.bias + f.x0 * w.a + f.x1 * w.b + f.x2 * w.c))), 6)
           AS score
  FROM feats f CROSS JOIN w{iters} w
) t
ORDER BY doc_id""")
    return "".join(parts)


def _lr_features(d: DataFrame) -> list:
    n = F.length("text")
    spaces = n - F.length(F.expr("replace(text, ' ', '')"))
    return [
        n / F.lit(300.0),
        spaces * F.lit(1.0) / F.greatest(n, F.lit(1)),
        n * F.lit(1.0) / (spaces + F.lit(1)) / F.lit(10.0),
    ]


@query("q_quality_classifier", oracle=_lr_oracle(), tags=("llm", "curation", "iterative"))
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.classifier import logreg_fit, logreg_score

    d = load(spark, sf_dir, "documents")
    feats = _lr_features(d)
    w = logreg_fit(
        d, feats, (F.col("lang") == "en"), iters=_LR_ITERS, lr=_LR_RATE
    )
    # pred thresholds the SAME rounded value the oracle thresholds
    # (ROUND(score, 6) >= 0.5): a raw score in [0.4999995, 0.5) must
    # round up to 0.5 -> pred=1 on BOTH engines, not just DuckDB.
    s6 = F.round(logreg_score(feats, w), 6)
    return d.select(
        "doc_id",
        s6.alias("score"),
        (s6 >= 0.5).cast("long").alias("pred"),
    ).orderBy("doc_id")


# Exact-size weighted sampling (Efraimidis-Spirakis): key = ln(u)/w,
# top-k keys win; u is the portable content hash so both engines draw
# the same "randomness". Selection is a global top-k — per-partition
# heaps + tiny merge (TakeOrderedAndProject), never a full sort.

# ORDER BY must bind the RAW key, not the rounded output alias: the
# operator's top-k selects on the raw key, and `ORDER BY es_key` after
# `ROUND(...) AS es_key` resolves to the OUTPUT column per the SQL
# standard — at sf1 twelve documents tie at the rounded -1e-06, so the
# alias-captured sort admitted a different ten into the top-20 than the
# raw-key order (caught by the r14 sf1 sweep; invisible at gate scales
# where top keys are sparse). Distinct inner name = no capture.
_ES_ORACLE = """
WITH keyed AS (
  SELECT doc_id,
         LN((CAST('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1.0)
            / 1152921504606846977.0)
           / (n_chars + 1) AS es_raw
  FROM documents WHERE n_chars + 1 > 0
)
SELECT doc_id, ROUND(es_raw, 6) + 0.0 AS es_key
FROM keyed ORDER BY es_raw DESC, doc_id LIMIT 20
"""
# `+ 0.0` on the rounded key: at sf1 a tiny-negative raw key rounds to
# IEEE -0.0, which DuckDB's ROUND preserves while Spark's normalizes to
# +0.0 — the value-hash CSV serializes the sign, so identical row sets
# still hash-mismatched (the residual half of the r14 sf1 catch). Same
# idiom as the FSM gate (dsl_queries.py); x + 0.0 == x for every other
# double, and the Spark side gets the mirror normalization below.


@query("q_weighted_sample_topk", oracle=_ES_ORACLE, tags=("llm", "curation"))
def q_weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.curation import weighted_sample_topk

    d = load(spark, sf_dir, "documents")
    out = weighted_sample_topk(d, F.col("n_chars") + 1, k=20)
    return out.select(
        "doc_id", (F.round("es_key", 6) + F.lit(0.0)).alias("es_key")
    )


# Hot-key thinning (bot-flood guard): keys over the cap are
# deterministically Bernoulli-thinned to ~cap expected rows; the gate
# reports per-key before/after counts so the oracle checks BOTH the
# hot-key detection and every individual keep/drop decision.

_THIN_CAP = 40

_THIN_ORACLE = f"""
WITH thot AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS _n FROM events
  GROUP BY user_id HAVING COUNT(*) > {_THIN_CAP}
),
tkept AS (
  SELECT e.user_id
  FROM events e LEFT JOIN thot h ON e.user_id = h.user_id
  WHERE h._n IS NULL
     OR {{hash}} % {{mod}}
        < GREATEST(FLOOR({float(_THIN_CAP)!r} * {{mod}} / CAST(h._n AS DOUBLE)), 1)
)
SELECT b.user_id, b.n_before, CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_before
      FROM events GROUP BY user_id) b
LEFT JOIN (SELECT user_id, COUNT(*) AS n_kept FROM tkept GROUP BY user_id) k
  ON b.user_id = k.user_id
ORDER BY b.user_id
"""


def _thin_oracle() -> str:
    h = _sql_hash(
        "CONCAT_WS(':', 'thin', CAST(e.user_id AS VARCHAR), CAST(e.event_id AS VARCHAR))"
    )
    return _THIN_ORACLE.format(hash=h, mod=C.SAMPLE_MOD)


@query("q_thin_hot_keys", oracle=_thin_oracle(), tags=("llm", "curation", "skew"))
def q_thin_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    thinned = C.thin_hot_keys(ev, "user_id", _THIN_CAP, id_col="event_id")
    before = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    kept = thinned.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return (
        before.join(kept, "user_id", "left")
        .select(
            "user_id",
            "n_before",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("user_id")
    )


# PII scrubbing (operators/curation.py::pii_scrub): the synthetic corpus
# carries no PII, so the gate INJECTS deterministic emails/IPs/phones
# (pure function of doc_id, identical expression in both engines) and
# then hash-checks every redacted byte and per-kind count.


def _pii_oracle() -> str:
    pats = {name: (pat, tok) for name, pat, tok in C.PII_PATTERNS}
    em, emt = pats["email"]
    ip, ipt = pats["ip"]
    ph, pht = pats["phone"]
    return f"""
WITH pii_in AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.7'
              || CASE WHEN doc_id % 3 = 0 THEN ' call 555-123-4567' ELSE '' END AS t
  FROM documents
),
pii_s1 AS (
  SELECT doc_id, CAST(LEN(regexp_extract_all(t, '{em}')) AS BIGINT) AS n_email,
         regexp_replace(t, '{em}', '{emt}', 'g') AS t
  FROM pii_in
),
pii_s2 AS (
  SELECT doc_id, n_email, CAST(LEN(regexp_extract_all(t, '{ip}')) AS BIGINT) AS n_ip,
         regexp_replace(t, '{ip}', '{ipt}', 'g') AS t
  FROM pii_s1
),
pii_s3 AS (
  SELECT doc_id, n_email, n_ip,
         CAST(LEN(regexp_extract_all(t, '{ph}')) AS BIGINT) AS n_phone,
         regexp_replace(t, '{ph}', '{pht}', 'g') AS t
  FROM pii_s2
)
SELECT doc_id, t AS clean_text, n_email, n_ip, n_phone,
       CAST(n_email + n_ip + n_phone AS BIGINT) AS n_redactions
FROM pii_s3
ORDER BY doc_id
"""


@query("q_pii_scrub", oracle=_pii_oracle(), tags=("llm", "curation", "text"))
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7"),
            F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(" call 555-123-4567"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return C.pii_scrub(injected).orderBy("doc_id")


# Luhn-gated credit-card redaction (operators/curation.py::CC_PATTERN +
# luhn_valid): the gate INJECTS, per document, one number whose check
# digit is computed by the Luhn formula (valid -> must be redacted),
# the SAME number with the check digit shifted by 5 (always invalid ->
# must survive byte-intact), and a 12-digit run (below the candidate
# window -> untouched). Both engines derive the check digit from the
# same integer arithmetic, so the oracle knows exactly which bytes get
# replaced — a scrubber that redacts unvalidated digit runs, or whose
# Luhn fold is wrong, hash-fails on every row.

_CC_ORACLE = """
WITH ccb AS (
  SELECT doc_id, text, LPAD(CAST(doc_id AS VARCHAR), 15, '4') AS b
  FROM documents
),
ccs AS (
  SELECT doc_id, text, b,
         LIST_SUM(LIST_TRANSFORM(RANGE(1, 16), k ->
           CASE WHEN k % 2 = 1
                THEN 2 * (ASCII(SUBSTR(b, 16 - k, 1)) - 48)
                     - CASE WHEN ASCII(SUBSTR(b, 16 - k, 1)) - 48 > 4 THEN 9 ELSE 0 END
                ELSE ASCII(SUBSTR(b, 16 - k, 1)) - 48 END)) AS s
  FROM ccb
),
ccn AS (
  SELECT doc_id, text,
         b || CAST((10 - s % 10) % 10 AS VARCHAR) AS valid_cc,
         b || CAST(((10 - s % 10) % 10 + 5) % 10 AS VARCHAR) AS bad_cc
  FROM ccs
),
cci AS (
  SELECT doc_id,
         text || ' card ' || valid_cc || ' ref ' || bad_cc
              || ' ord 123456789012 end' AS t,
         valid_cc
  FROM ccn
)
SELECT doc_id,
       regexp_replace(t, '\\b' || valid_cc || '\\b', '[CC]', 'g') AS clean_text,
       CAST(1 AS BIGINT) AS n_cc,
       CAST(1 AS BIGINT) AS n_redactions
FROM cci
ORDER BY doc_id
"""


@query("q_pii_scrub_cc", oracle=_CC_ORACLE, tags=("llm", "curation", "text"))
def q_pii_scrub_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    b = F.lpad(F.col("doc_id").cast("string"), 15, "4")

    def digit(k):
        return F.ascii(b.substr(F.lit(16) - k, F.lit(1))) - 48

    term = lambda k: F.when(  # noqa: E731
        F.pmod(k, F.lit(2)) == 1,
        digit(k) * 2 - F.when(digit(k) > 4, F.lit(9)).otherwise(F.lit(0)),
    ).otherwise(digit(k))
    s = F.aggregate(
        F.transform(F.sequence(F.lit(1), F.lit(15)), term),
        F.lit(0),
        lambda a, v: a + v,
    )
    check = F.pmod(F.lit(10) - F.pmod(s, F.lit(10)), F.lit(10))
    valid_cc = F.concat(b, check.cast("string"))
    bad_cc = F.concat(b, F.pmod(check + 5, F.lit(10)).cast("string"))
    injected = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" card "), valid_cc,
            F.lit(" ref "), bad_cc,
            F.lit(" ord 123456789012 end"),
        ).alias("text"),
    )
    return C.pii_scrub(injected, patterns=(C.CC_PATTERN,)).orderBy("doc_id")


_CONSOLIDATE_ORACLE = """
WITH cand AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_id % 2 = 0 THEN event_type END AS segment,
         CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS score
  FROM events
),
ranked AS (
  SELECT user_id,
         ROW_NUMBER() OVER (
           PARTITION BY user_id
           ORDER BY (CASE WHEN segment IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN score IS NOT NULL THEN 1 ELSE 0 END) DESC,
                    ts DESC, event_id DESC) AS rn,
         FIRST_VALUE(segment IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY (CASE WHEN segment IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN score IS NOT NULL THEN 1 ELSE 0 END) DESC,
                    ts DESC, event_id DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS segment,
         FIRST_VALUE(score IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY (CASE WHEN segment IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN score IS NOT NULL THEN 1 ELSE 0 END) DESC,
                    ts DESC, event_id DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS score
  FROM cand
)
SELECT user_id, segment, score FROM ranked WHERE rn = 1
ORDER BY user_id
"""


@query(
    "q_consolidate_records",
    oracle=_CONSOLIDATE_ORACLE,
    tags=("curation", "dedup"),
)
def q_consolidate_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship per user over sparsified event
    'profiles' (deterministic NULL injection): most-complete record
    wins, then latest (ts, event_id); NULL fields backfilled by the
    first non-null in priority order — ONE shuffle + one window pass
    (operators/curation.py::consolidate_records)."""
    e = load(spark, sf_dir, "events")
    cand = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.col("event_type")).alias(
            "segment"
        ),
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("score"),
    )
    return C.consolidate_records(
        cand,
        ["user_id"],
        priority=[("ts", "desc"), ("event_id", "desc")],
        value_cols=["segment", "score"],
        completeness_first=True,
    ).orderBy("user_id")


def _cdf_match_oracle(n_grid: int = 1000) -> str:
    qs = ", ".join(repr(i / n_grid) for i in range(n_grid + 1))
    return f"""
WITH src AS (
  SELECT event_id, event_type, value FROM events WHERE value IS NOT NULL
),
grid AS (SELECT QUANTILE_CONT(value, [{qs}]) AS g FROM src),
ranked AS (
  SELECT event_id, event_type, value,
         PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value) AS pct_rank
  FROM src
)
SELECT event_id, event_type, value, pct_rank,
       ROUND(
         g[CAST(FLOOR(pct_rank * {n_grid}) AS INT) + 1]
         + (g[LEAST(CAST(FLOOR(pct_rank * {n_grid}) AS INT) + 2, {n_grid + 1})]
            - g[CAST(FLOOR(pct_rank * {n_grid}) AS INT) + 1])
           * (pct_rank * {n_grid} - FLOOR(pct_rank * {n_grid})), 6) AS calibrated
FROM ranked CROSS JOIN grid
ORDER BY event_id
"""


@query(
    "q_cdf_match",
    oracle=_cdf_match_oracle(),
    tags=("curation", "llm"),
)
def q_cdf_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score calibration: each event_type's values mapped
    onto the pooled value distribution at their within-type percent
    rank (curation.py::cdf_match) — after this, a score threshold
    means the same thing in every source."""
    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = C.cdf_match(e, ["event_type"], "value")
    return out.select(
        "event_id", "event_type", "value", "pct_rank", "calibrated"
    ).orderBy("event_id")


_GROUP_SPLIT_ORACLE = """
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM (
  SELECT user_id,
         CASE WHEN CAST('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 100 < 90 THEN 'train'
              WHEN CAST('0x' || SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 15)
                   AS BIGINT) % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM events
) t
GROUP BY split
ORDER BY split
"""


@query("q_group_split", oracle=_GROUP_SPLIT_ORACLE, tags=("llm", "curation"))
def q_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split: assignment hashes the USER, so each user's
    whole event history lands in one split (curation.py::group_split —
    a pure projection, zero shuffle). n_users per split sums to the
    distinct-user total precisely BECAUSE no user straddles splits."""
    e = load(spark, sf_dir, "events")
    return (
        C.group_split(e, "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("split")
    )
