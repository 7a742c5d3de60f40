"""LLM-data-pipeline operators (SURVEY.md §2.2 "LLM-data-pipeline
extensions"): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
embedding similarity search (brute-force + IVF), text analysis (language ID,
quality scoring, token counting, fingerprinting).

Portability device: a *portable hash* usable identically in Spark and
DuckDB — `H(s) = bigint(first 15 hex chars of md5(s))` (60 bits, fits
int64 in both engines). MinHash permutations are (a*H(s)+b) mod p with
H reduced mod p=2^31-1 first so products stay < 2^62 (no int64 overflow).

Scale notes:
- MinHash signatures are per-row scalar expressions (no explode → no row
  blowup); LSH banding turns O(n²) pair search into an equi-join on
  (band_id, band_hash) — the shuffle key distributes uniformly.
- Brute-force cosine top-k broadcasts the (small) query set; per-row work
  is a codegen'd array expression. The IVF variant prunes candidates by
  coarse quantization: nearest-centroid assignment, then search only in
  probed cells — the 100 TB path.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.operators import dedup as D
from rspl_spark.operators.dedup import (
    MERSENNE_P,
    MINHASH_COEFS,
    _SH_C1,
    _SH_C2,
    portable_hash,
)
from rspl_spark.operators.similarity import cosine_expr as cosine
from rspl_spark.operators.similarity import exact_scored_pairs, unit_prep
from rspl_spark.queries import query

# The Spark-side kernels live in rspl_spark.operators.{dedup,similarity}
# (reusable API); this module binds them to the testdata tables and pairs
# each with its DuckDB oracle. DuckDB side of the portable hash:
#   CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT)


def _memo_artifact(spark: SparkSession, key: tuple, build):
    """Session-memoized materialized intermediate (signature/sketch
    tables): ONE eager localCheckpoint per (artifact, sf_dir) per
    session, shared by every query that reads it. This is both the
    cluster-scale design (signatures are written once and banded
    against, not recomputed per query) and the fix for checkpoint
    accumulation — repeated invocations reuse the artifact instead of
    pinning a fresh copy each call. The cache dies with the session."""
    cache = getattr(spark, "_rspl_artifact_cache", None)
    if cache is None:
        cache = {}
        spark._rspl_artifact_cache = cache
    if key not in cache:
        cache[key] = build().localCheckpoint(eager=True)
    return cache[key]


def _sql_hash(expr: str) -> str:
    return f"CAST('0x' || SUBSTR(MD5({expr}), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# Exact deduplication: content-hash grouping; keeper = min doc_id.
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""
SELECT h, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, COUNT(*) AS n_copies
FROM (SELECT doc_id, MD5(text) AS h FROM documents) t
GROUP BY h
ORDER BY keeper_id
"""


@query("q_dedup_exact", oracle=_EXACT_DEDUP_ORACLE, tags=("llm", "dedup"))
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.exact_dedup(d).orderBy("keeper_id")


# Normalized exact dedup: lowercase, collapse whitespace, trim — the
# standard "shallow" near-dup pass before MinHash.

_NORM_DEDUP_ORACLE = """
SELECT norm_h, CAST(MIN(doc_id) AS BIGINT) AS keeper_id, COUNT(*) AS n_copies
FROM (SELECT doc_id,
             MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS norm_h
      FROM documents) t
GROUP BY norm_h
ORDER BY keeper_id
"""


@query("q_dedup_exact_normalized", oracle=_NORM_DEDUP_ORACLE, tags=("llm", "dedup"))
def q_dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return (
        d.select("doc_id", F.md5(norm).alias("norm_h"))
        .groupBy("norm_h")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_id")
    )


# ---------------------------------------------------------------------------
# MinHash signatures over word 3-shingles. Scalar per-row expression:
# tokens → shingles → H mod p → min over (a*h+b) mod p per permutation.
# ---------------------------------------------------------------------------


def _sql_hashed_shingles(text: str = "text") -> str:
    th = (
        f"LIST_TRANSFORM(STRING_SPLIT_REGEX(TRIM({text}), '\\s+'), "
        f"t -> {_sql_hash('t')} % {MERSENNE_P})"
    )
    return (
        f"LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(th) - 2, 1) + 1), "
        f"i -> (th[i] * {_SH_C1} + COALESCE(th[i + 1], 0) * {_SH_C2} "
        f"+ COALESCE(th[i + 2], 0)) % {MERSENNE_P}))"
    ), th


def _sql_shingles(text: str = "text", k: int = 3) -> str:
    return (
        f"LIST_DISTINCT(LIST_TRANSFORM("
        f"RANGE(1, GREATEST(LEN(STRING_SPLIT_REGEX(TRIM({text}), '\\s+')) - {k - 1}, 1) + 1), "
        f"i -> ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT_REGEX(TRIM({text}), '\\s+'), i, i + {k - 1}), ' ')))"
    )


def _sql_minhash(j: int) -> str:
    a, b = MINHASH_COEFS[j]
    return f"LIST_MIN(LIST_TRANSFORM(sh, h -> ({a} * h + {b}) % {MERSENNE_P})) AS mh{j}"


def _sql_sig_source() -> str:
    """Subquery producing (doc_id, sh) with sh = hashed 3-token shingles."""
    sh_expr, th_expr = _sql_hashed_shingles()
    return (
        f"(SELECT doc_id, {sh_expr} AS sh "
        f"FROM (SELECT doc_id, {th_expr} AS th FROM documents) th_t)"
    )


_MINHASH_ORACLE = f"""
SELECT doc_id, {", ".join(_sql_minhash(j) for j in range(8))}
FROM {_sql_sig_source()} t
ORDER BY doc_id
"""


@query("q_minhash_signatures", oracle=_MINHASH_ORACLE, tags=("llm", "dedup"))
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.minhash_signatures(d).orderBy("doc_id")


# MinHash-LSH near-dup pairs: band the 8-slot signature into 4 bands of 2,
# equi-join on (band, h1, h2), then estimate Jaccard as matching-slot
# fraction. At scale this is the only join — candidates only.

_LSH_PAIRS_ORACLE = f"""
WITH sig AS (
  SELECT doc_id, {", ".join(_sql_minhash(j) for j in range(8))}
  FROM {_sql_sig_source()} t
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 AS h1, mh1 AS h2 FROM sig UNION ALL
  SELECT doc_id, 1 AS band, mh2 AS h1, mh3 AS h2 FROM sig UNION ALL
  SELECT doc_id, 2 AS band, mh4 AS h1, mh5 AS h2 FROM sig UNION ALL
  SELECT doc_id, 3 AS band, mh6 AS h1, mh7 AS h2 FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END +
              CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) / 8.0, 6) AS est_jaccard
FROM cand c JOIN sig sa ON c.doc_a = sa.doc_id JOIN sig sb ON c.doc_b = sb.doc_id
ORDER BY c.doc_a, c.doc_b
"""


@query("q_minhash_lsh_pairs", oracle=_LSH_PAIRS_ORACLE, tags=("llm", "dedup"))
def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Materialize the signature table before the band self-join
    # (localCheckpoint, not cache): the join references the signature
    # subtree twice, so truncating lineage halves both the analysis tree
    # and the uncached compute. At cluster scale the same role is played
    # by writing signatures to a table and banding against that.
    sig = _memo_artifact(spark, ("minhash_sig", sf_dir), lambda: D.minhash_signatures(d))
    return D.lsh_candidate_pairs(sig).orderBy("doc_a", "doc_b")


# Near-dup clusters: connected components over the LSH candidate pairs
# (est jaccard >= 0.25) — the keep-one-per-cluster step. Spark runs
# iterative min-label propagation; the oracle computes the transitive
# closure with a recursive CTE.

_CLUSTERS_ORACLE = """
WITH RECURSIVE sig AS (
  SELECT doc_id, {mh}
  FROM {src} t
),
bands AS (
  SELECT doc_id, 0 AS band, mh0 AS h1, mh1 AS h2 FROM sig UNION ALL
  SELECT doc_id, 1 AS band, mh2 AS h1, mh3 AS h2 FROM sig UNION ALL
  SELECT doc_id, 2 AS band, mh4 AS h1, mh5 AS h2 FROM sig UNION ALL
  SELECT doc_id, 3 AS band, mh6 AS h1, mh7 AS h2 FROM sig
),
pairs AS (
  SELECT c.doc_a, c.doc_b FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
  ) c JOIN sig sa ON c.doc_a = sa.doc_id JOIN sig sb ON c.doc_b = sb.doc_id
  WHERE (CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh4 = sb.mh4 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh5 = sb.mh5 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh6 = sb.mh6 THEN 1 ELSE 0 END +
         CASE WHEN sa.mh7 = sb.mh7 THEN 1 ELSE 0 END) / 8.0 >= 0.25
),
und AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT a AS src, a AS dst FROM und
  UNION SELECT a, b FROM und
  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
)
SELECT src AS doc_id, MIN(dst) AS cluster
FROM reach GROUP BY src
ORDER BY doc_id
"""


def _clusters_oracle() -> str:
    mh = ", ".join(_sql_minhash(j) for j in range(8))
    return _CLUSTERS_ORACLE.replace("{mh}", mh).replace("{src}", _sql_sig_source())


@query("q_dedup_clusters", oracle=_clusters_oracle(), tags=("llm", "dedup", "iterative"))
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # large-star/small-star (O(log n) rounds) is the scale path — the
    # one-hop label-propagation variant needs diameter-many rounds.
    from rspl_spark.operators.dedup import connected_components_star, lsh_candidate_pairs

    d = load(spark, sf_dir, "documents")
    sig = _memo_artifact(spark, ("minhash_sig", sf_dir), lambda: D.minhash_signatures(d))
    pairs = lsh_candidate_pairs(sig, threshold=0.25)
    return connected_components_star(pairs).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (ground truth for MinHash): explode shingles,
# equi-join on shingle, |A∩B| / |A∪B|. Quadratic in colliding docs — the
# exact verifier you run on LSH candidates at scale, here run on the whole
# (small) corpus with a similarity floor.
# ---------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, UNNEST({_sql_shingles()}) AS s FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) >= 0.1
ORDER BY i.doc_a, i.doc_b
"""


@query("q_ngram_jaccard_pairs", oracle=_JACCARD_ORACLE, tags=("llm", "dedup"))
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # gate scale: the oracle IS the O(n^2) definition, so the Spark
    # side runs the full self-join deliberately (allow_quadratic);
    # production verifies LSH candidates via the candidates= path.
    return D.ngram_jaccard_pairs(d, min_jaccard=0.1, allow_quadratic=True).orderBy("doc_a", "doc_b")


# Content-defined chunking (FastCDC at token granularity): boundaries
# after tokens whose portable hash ≡ 0 (mod 8) — content-dependent, so
# insertions shift one chunk, not every window. q_cdc_dup_chunks is the
# exact-substring dedup readout: chunks recurring across documents.

_CDC_DIVISOR = 8

_CDC_CTE = f"""
WITH base AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS ts FROM documents
),
b2 AS (
  SELECT doc_id, ts,
         LIST_FILTER(RANGE(1, LEN(ts) + 1),
                     i -> ({_sql_hash("ts[i]")} % {MERSENNE_P}) % {_CDC_DIVISOR} = 0) AS bounds
  FROM base
),
b3 AS (
  SELECT doc_id, ts,
         LIST_PREPEND(1, LIST_TRANSFORM(bounds, b -> b + 1)) AS starts,
         LIST_APPEND(bounds, LEN(ts)) AS ends
  FROM b2
),
chunks AS (
  SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS chunk_idx,
         MD5(ARRAY_TO_STRING(LIST_SLICE(ts, starts[u.i], ends[u.i]), ' ')) AS chunk_hash,
         CAST(ends[u.i] - starts[u.i] + 1 AS BIGINT) AS n_chunk_tokens
  FROM b3, UNNEST(RANGE(1, LEN(starts) + 1)) AS u(i)
  WHERE starts[u.i] <= ends[u.i]
)
"""

_CDC_ORACLE = _CDC_CTE + """
SELECT doc_id, chunk_idx, chunk_hash, n_chunk_tokens
FROM chunks
ORDER BY doc_id, chunk_idx
"""


@query("q_cdc_chunks", oracle=_CDC_ORACLE, tags=("llm", "dedup"))
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.cdc_chunks(d, divisor=_CDC_DIVISOR).orderBy("doc_id", "chunk_idx")


_CDC_DUP_ORACLE = _CDC_CTE + """
SELECT chunk_hash,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY chunk_hash
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY chunk_hash
"""


@query("q_cdc_dup_chunks", oracle=_CDC_DUP_ORACLE, tags=("llm", "dedup"))
def q_cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chunks = D.cdc_chunks(d, divisor=_CDC_DIVISOR)
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("chunk_hash")
    )


# Corpus-level duplicated-shingle fraction (Lee et al. 2022 exact-substring
# signal at shingle granularity): per doc, the share of its distinct
# 3-shingles that occur in at least one other document.

_SHINGLE_FRAC_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, UNNEST({_sql_shingles()}) AS s FROM documents
),
dp AS (SELECT s, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN dp.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(CAST(SUM(CASE WHEN dp.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS shared_frac
FROM sh JOIN dp ON sh.s = dp.s
GROUP BY sh.doc_id
ORDER BY sh.doc_id
"""


@query("q_duplicated_shingle_fraction", oracle=_SHINGLE_FRAC_ORACLE, tags=("llm", "dedup"))
def q_duplicated_shingle_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.duplicated_shingle_fraction(d).orderBy("doc_id")


# ---------------------------------------------------------------------------
# SimHash (32-bit) over word tokens: per-bit weighted vote of token hashes.
# ---------------------------------------------------------------------------


def _simhash_body() -> str:
    """(doc_id, simhash) derivation, reused by the signature query and
    the near-dup pair oracle."""
    toks = "LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))"
    hs = f"LIST_TRANSFORM({toks}, t -> {_sql_hash('t')})"
    bits = " + ".join(
        f"(CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h -> CASE WHEN (h // {1 << i}) % 2 = 1 "
        f"THEN 1 ELSE -1 END)) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM (SELECT doc_id, {hs} AS hs FROM documents) t"


def _simhash_sql() -> str:
    return _simhash_body() + " ORDER BY doc_id"


@query("q_simhash", oracle=_simhash_sql(), tags=("llm", "dedup"))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.simhash(d).orderBy("doc_id")


# SimHash near-dup pairs: hamming(simhash_a, simhash_b) <= 1 found by a
# banded equi-join, NOT an all-pairs scan. Pigeonhole makes the banding
# EXACT here: two 16-bit bands and at most 1 differing bit means at least
# one band is identical, so every qualifying pair lands in some bucket —
# recall is 100% by construction, and the oracle can therefore be the
# literal O(n²) definition (fine at gate scale; the Spark side is the
# 100 TB formulation, shuffle keyed on (band, value) like MinHash-LSH).

_SIMHASH_NEARDUP_ORACLE = f"""
WITH sh AS ({_simhash_body()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(BIT_COUNT(CAST(XOR(a.simhash, b.simhash) AS BIGINT)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE BIT_COUNT(CAST(XOR(a.simhash, b.simhash) AS BIGINT)) <= 1
ORDER BY doc_a, doc_b
"""


# Linear-output simhash dedup (the scale path the pair gate is NOT):
# identical signatures collapse to one representative before any pair
# is mined, so in-clique quadratic output never materializes — at sf10
# the pair formulation's output explodes into the billions while this
# stays one row per doc. Oracle: distinct-signature pairs (tiny) + the
# recursive-CTE reachability pattern of the semantic-dedup gate.

_SIMHASH_CLUSTER_ORACLE = f"""
WITH RECURSIVE sh AS ({_simhash_body()}),
sc_sig AS (SELECT simhash, MIN(doc_id) AS rep FROM sh GROUP BY simhash),
sc_pairs AS (
  SELECT a.rep AS pa, b.rep AS pb
  FROM sc_sig a JOIN sc_sig b
    ON a.rep < b.rep
   AND BIT_COUNT(CAST(XOR(a.simhash, b.simhash) AS BIGINT)) <= 1
),
sc_und AS (
  SELECT pa AS a, pb AS b FROM sc_pairs
  UNION SELECT pb, pa FROM sc_pairs
),
sc_reach AS (
  SELECT a AS src, a AS dst FROM sc_und
  UNION SELECT a, b FROM sc_und
  UNION SELECT r.src, u.b FROM sc_reach r JOIN sc_und u ON r.dst = u.a
),
sc_comp AS (
  SELECT src AS rep, MIN(dst) AS cluster FROM sc_reach GROUP BY src
)
SELECT s.doc_id,
       COALESCE(c.cluster, g.rep) AS cluster,
       CAST(CASE WHEN COALESCE(c.cluster, g.rep) = s.doc_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sh s
JOIN sc_sig g ON s.simhash = g.simhash
LEFT JOIN sc_comp c ON c.rep = g.rep
ORDER BY s.doc_id
"""


@query(
    "q_simhash_dedup_clusters",
    oracle=_SIMHASH_CLUSTER_ORACLE,
    tags=("llm", "dedup", "scale", "iterative"),
)
def q_simhash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sig = _memo_artifact(spark, ("simhash", sf_dir), lambda: D.simhash(d))
    return D.simhash_clusters(d, sig=sig).orderBy("doc_id")


@query("q_simhash_neardup_pairs", oracle=_SIMHASH_NEARDUP_ORACLE, tags=("llm", "dedup"))
def q_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    sh = _memo_artifact(spark, ("simhash", sf_dir), lambda: D.simhash(d))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bv"),
                    )
                    for i in range(2)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bv")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 1)
        .distinct()
    )
    return pairs.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Embedding similarity search.
# ---------------------------------------------------------------------------


_SQL_COS = (
    "LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), p -> "
    "CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) / "
    "(SQRT(LIST_SUM(LIST_TRANSFORM({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * "
    "SQRT(LIST_SUM(LIST_TRANSFORM({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)

_BRUTE_TOPK_ORACLE = f"""
SELECT query_id, vec_id, score, rk FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         ROUND({_SQL_COS.format(a="q.embedding", b="v.embedding")}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY {_SQL_COS.format(a="q.embedding", b="v.embedding")} DESC,
                                     v.vec_id) AS rk
  FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
  CROSS JOIN embeddings v
  WHERE q.vec_id <> v.vec_id
) t WHERE rk <= 5
ORDER BY query_id, rk
"""


@query("q_cosine_topk_bruteforce", oracle=_BRUTE_TOPK_ORACLE, tags=("llm", "similarity"))
def q_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-k — the oracle anchor for the ANN variants. The
    quadratic blow-up is bounded here by the broadcast 10-row query side
    (n x 10, not n x n); corpus-scale search goes through IVF/SRP."""
    e = load(spark, sf_dir, "embeddings")
    # Per-side prep (cast + norm once per row, only the dot per pair) and
    # a repartition of the streamed candidate side: the interpreted
    # higher-order dot is the per-pair cost, and the small parquet would
    # otherwise stream through ONE task.
    cand = _with_unit_prep(e, "vec_id", "a_emb", "a_nrm").repartition(32)
    q = _with_unit_prep(e.filter(F.col("vec_id") < 10), "query_id", "b_emb", "b_nrm")
    # Broadcast the small query set; candidates stream through map-side.
    scored = (
        exact_scored_pairs(cand, q, "raw_score", allow_quadratic=True)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "raw_score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("raw_score"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


# IVF-style ANN: coarse-quantize every vector to its nearest of 8 fixed
# centroids (deterministic "codebook" = vec_id 0..7), probe the query's 2
# nearest cells, search only within. The 100 TB path: candidate set shrinks
# by ~cells/probes; the join key (cell) partitions the shuffle.

_IVF_ORACLE = f"""
WITH centroids AS (SELECT vec_id AS cid, embedding AS cemb FROM embeddings WHERE vec_id < 8),
assign AS (
  SELECT vec_id, embedding, cid FROM (
    SELECT v.vec_id, v.embedding, c.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY {_SQL_COS.format(a="v.embedding", b="c.cemb")} DESC,
                                       c.cid) AS crk
    FROM embeddings v CROSS JOIN centroids c
  ) t WHERE crk = 1
),
probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {_SQL_COS.format(a="q.embedding", b="c.cemb")} DESC,
                                       c.cid) AS crk
    FROM (SELECT * FROM embeddings WHERE vec_id < 10) q CROSS JOIN centroids c
  ) t WHERE crk <= 2
)
SELECT query_id, vec_id, score, rk FROM (
  SELECT p.query_id, a.vec_id,
         ROUND({_SQL_COS.format(a="q.embedding", b="a.embedding")}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {_SQL_COS.format(a="q.embedding", b="a.embedding")} DESC,
                                     a.vec_id) AS rk
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) t WHERE rk <= 5
ORDER BY query_id, rk
"""


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _ivf_topk(e: DataFrame, cent: DataFrame, n_queries: int = 10, n_probe: int = 2, k: int = 5) -> DataFrame:
    """Shared IVF flow: assign all vectors to their nearest codebook cell
    (broadcast codebook), probe each query's n_probe nearest cells,
    exact-search only within — candidate set shrinks by ~cells/probes and
    the cell id keys the shuffle. Casts and norms are hoisted per side
    (vectors once, codebook once) so per-pair work is one dot product;
    the streamed vector side is spread over partitions because the
    interpreted higher-order dot would otherwise run in one task."""
    prep = _with_unit_prep(e, "vec_id", "emb", "nrm").repartition(32)
    # double-cast BEFORE the norm/dot so float codebooks (the untrained
    # first-k-vectors variant) compute in double like the oracle does
    cdbl = F.transform(F.col("cemb"), lambda x: x.cast("double"))
    cnorm = F.sqrt(F.aggregate(cdbl, F.lit(0.0), lambda s, v: s + v * v))
    centp = cent.select("cid", cdbl.alias("cemb"), cnorm.alias("cnrm"))
    csim = (_dot(F.col("emb"), F.col("cemb")) / F.nullif(F.col("nrm") * F.col("cnrm"), F.lit(0.0))).alias("csim")
    # Assignment: every vector scored against the broadcast codebook.
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    assign = (
        prep.crossJoin(F.broadcast(centp))
        .select("vec_id", "emb", "nrm", "cid", csim)
        .withColumn("crk", F.row_number().over(w_assign))
        .filter(F.col("crk") == 1)
        .select("vec_id", "emb", "nrm", "cid")
    )
    q = prep.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(centp))
        .select(
            "query_id",
            "q_emb",
            "q_nrm",
            "cid",
            (_dot(F.col("q_emb"), F.col("cemb")) / F.nullif(F.col("q_nrm") * F.col("cnrm"), F.lit(0.0))).alias("csim"),
        )
        .withColumn("crk", F.row_number().over(w_probe))
        .filter(F.col("crk") <= n_probe)
        .select("query_id", "q_emb", "q_nrm", "cid")
    )
    cand = probes.join(assign, "cid").filter(F.col("vec_id") != F.col("query_id"))
    w_top = Window.partitionBy("query_id").orderBy(F.desc("raw_score"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id",
            "vec_id",
            (_dot(F.col("q_emb"), F.col("emb")) / F.nullif(F.col("q_nrm") * F.col("nrm"), F.lit(0.0))).alias("raw_score"),
        )
        .withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


@query("q_cosine_topk_ivf", oracle=_IVF_ORACLE, tags=("llm", "similarity"))
def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    return _ivf_topk(e, cent)


def _kmeans_ctes(
    k: int = 8,
    iters: int = 3,
    train_pred: str | None = None,
    k_sql: str | None = None,
) -> str:
    """WITH-clause prefix deriving k-means centroids independently in
    SQL: ev (long-format embeddings), c0 (init = first k vectors), then
    per-iteration assignment/update CTEs ending at c{iters} =
    (cid, dim, val). Shared by the k-means and trained-IVF oracles.

    ``train_pred`` restricts TRAINING (init + every Lloyd update) to a
    slice of the corpus — the incremental-index replay, where appended
    vectors are assigned with centroids the fit never saw. Init then
    takes the k smallest ids IN THE SLICE (rank-numbered cids, matching
    kmeans_fit's orderBy(id).limit(k) on the base frame).

    ``k_sql`` (mutually exclusive with ``k`` in effect) derives the
    cluster count IN SQL — the adaptive-k replay, where the operator
    computes k from the corpus size. k only reaches the chain through
    the init CTE (testdata ids are dense 0..n-1, so "first k vectors"
    is WHERE vec_id < k), so a scalar-subquery bound is all it takes."""
    k_term = f"({k_sql})" if k_sql is not None else str(k)
    if train_pred is None:
        train_src = "ev"
        c0 = f"c0 AS (SELECT vec_id AS cid, dim, val FROM ev WHERE vec_id < {k_term})"
    else:
        train_src = "evt"
        c0 = f"""evt AS (SELECT * FROM ev WHERE {train_pred}),
c0 AS (
  SELECT CAST(r.rk - 1 AS BIGINT) AS cid, e.dim, e.val
  FROM (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
        FROM (SELECT DISTINCT vec_id FROM evt ORDER BY vec_id LIMIT {k_term})) r
  JOIN evt e ON e.vec_id = r.vec_id)"""
    parts = [
        f"""
WITH ev AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
),
{c0}"""
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        parts.append(
            f"""
d{i} AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM {train_src} e JOIN {prev} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
),
a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM d{i}
  ) t WHERE rk = 1
),
u{i} AS (
  SELECT a.cid, e.dim, AVG(e.val) AS c
  FROM a{i} a JOIN ev e ON a.vec_id = e.vec_id
  GROUP BY a.cid, e.dim
),
c{i} AS (
  SELECT p.cid, p.dim, COALESCE(u.c, p.val) AS val
  FROM {prev} p LEFT JOIN u{i} u ON u.cid = p.cid AND u.dim = p.dim
)"""
        )
        prev = f"c{i}"
    return ",".join(parts)



# LSH-bucketed ANN (sign random projection): the OTHER classic ANN scale
# path next to IVF. 16 deterministic +/-1 hyperplanes (integer-hash
# signs, generated once driver-side — no RNG) give each vector a 16-bit
# sketch; 4 bands x 4 bits bucket the corpus; a query searches only the
# vectors sharing a band. Banding-then-exact-rerank is the semantics
# (mirrored in the oracle), so the result is exactly verifiable. At
# scale the band value keys the shuffle. Band width tunes recall vs
# candidate volume: this synthetic corpus has no close neighbors (max
# pairwise cosine ~0.5), so narrow 4-bit bands are the honest operating
# point; high-similarity corpora would widen them.

_SRP_PLANES = 16
_SRP_DIM = 64


def _srp_signs(p: int) -> list[int]:
    # splitmix-ish integer hash; deterministic, identical in the oracle
    return [
        1 if ((p * _SRP_DIM + d) * 2654435761 % 4294967296) >> 31 else -1
        for d in range(_SRP_DIM)
    ]


def _srp_sketch_col(emb: Column) -> Column:
    """16-bit SRP sketch as a long: bit p = (dot(emb, plane_p) >= 0)."""
    dbl = F.transform(emb, lambda x: x.cast("double"))
    bits = None
    for p in range(_SRP_PLANES):
        signs = F.array(*[F.lit(float(s)) for s in _srp_signs(p)])
        dot = _dot(dbl, signs)
        bit = F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("long")


def _srp_sketch_sql(emb: str) -> str:
    terms = []
    for p in range(_SRP_PLANES):
        signs = "[" + ", ".join(f"{float(s)}" for s in _srp_signs(p)) + "]"
        dot = (
            f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP({emb}, {signs}), "
            f"pr -> CAST(pr[1] AS DOUBLE) * pr[2]))"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << p} ELSE 0 END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _srp_oracle(store_pred: str = "TRUE") -> str:
    """SRP band-then-rerank oracle; ``store_pred`` (over ``v.vec_id``)
    restricts the CANDIDATE side only — the delete-gate variant drops
    tombstoned vectors from the store while queries stay unrestricted,
    exactly the tombstone filter's semantics."""
    return f"""
WITH sk AS (
  SELECT vec_id, embedding, {_srp_sketch_sql("embedding")} AS sketch
  FROM embeddings
),
bands AS (
  SELECT vec_id, embedding, b.band, (sketch // POWER(16, b.band)::BIGINT) % 16 AS bv
  FROM sk, (SELECT UNNEST([0, 1, 2, 3]) AS band) b
),
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, v.vec_id
  FROM bands q JOIN bands v ON q.band = v.band AND q.bv = v.bv
  WHERE q.vec_id < 10 AND q.vec_id <> v.vec_id AND ({store_pred})
)
SELECT query_id, vec_id, score, rk FROM (
  SELECT c.query_id, c.vec_id,
         ROUND({_SQL_COS.format(a="eq.embedding", b="ev.embedding")}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY c.query_id
                            ORDER BY {_SQL_COS.format(a="eq.embedding", b="ev.embedding")} DESC,
                                     c.vec_id) AS rk
  FROM cand c
  JOIN embeddings eq ON eq.vec_id = c.query_id
  JOIN embeddings ev ON ev.vec_id = c.vec_id
) t WHERE rk <= 5
ORDER BY query_id, rk
"""


_SRP_ORACLE = _srp_oracle()


@query("q_cosine_topk_srp", oracle=_SRP_ORACLE, tags=("llm", "similarity"))
def q_cosine_topk_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k under SRP/LSH bucketing: candidates share a sketch band
    with the query, then exact cosine rerank."""
    e = load(spark, sf_dir, "embeddings")
    prep = _memo_artifact(
        spark,
        ("srp_prep", sf_dir),
        lambda: _with_unit_prep(e, "vec_id", "emb", "nrm")
        .withColumn("sketch", _srp_sketch_col(F.col("emb")))
        .repartition(32),
    )
    bands = prep.select(
        "vec_id",
        "emb",
        "nrm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sketch", 4 * b).bitwiseAND(F.lit(0xF)).alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "emb", "nrm", "b.band", "b.bv")
    qb = bands.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        "band",
        "bv",
    )
    cand = (
        qb.join(bands, ["band", "bv"])
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
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


# IVF with a TRAINED codebook: centroids come from 2 Lloyd iterations
# (deterministic init) instead of the first-8-vectors placeholder — real
# cells follow the data distribution, which is what gives IVF its recall
# (recall@5 >= 0.8 vs brute force asserted in tests). The oracle
# re-derives the SAME training run in SQL via the shared k-means CTE
# chain, then probes/searches in SQL — full hash check end to end.

_IVF_TRAINED_ITERS = 2


def _ivf_trained_oracle(k: int = 8, iters: int = _IVF_TRAINED_ITERS) -> str:
    cos = _SQL_COS.format(a="q.embedding", b="v.embedding")
    return (
        _kmeans_ctes(k, iters)
        + f""",
cnorm AS (SELECT cid, SQRT(SUM(val * val)) AS nrm FROM c{iters} GROUP BY cid),
ecos AS (
  SELECT e.vec_id, c.cid, SUM(e.val * c.val) AS dot, SQRT(SUM(e.val * e.val)) AS en
  FROM ev e JOIN c{iters} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
),
sim AS (
  SELECT ec.vec_id, ec.cid, ec.dot / NULLIF(ec.en * n.nrm, 0) AS csim
  FROM ecos ec JOIN cnorm n ON ec.cid = n.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
    FROM sim
  ) t WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
    FROM sim WHERE vec_id < 10
  ) t WHERE crk <= 2
)
SELECT query_id, vec_id, score, rk FROM (
  SELECT p.query_id, a.vec_id,
         ROUND({cos}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {cos} DESC, a.vec_id) AS rk
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN embeddings v ON v.vec_id = a.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id
) t WHERE rk <= 5
ORDER BY query_id, rk"""
    )


@query(
    "q_cosine_topk_ivf_trained",
    oracle=_ivf_trained_oracle(),
    tags=("llm", "similarity", "iterative"),
)
def q_cosine_topk_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import kmeans_fit

    e = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, iters=_IVF_TRAINED_ITERS)
    cent = spark.createDataFrame(
        [(ci, c) for ci, c in enumerate(cents)], "cid long, cemb array<double>"
    )
    return _ivf_topk(e, cent)


# Persisted-SRP two-batch replay (operators/ann_store.py): the band
# table is built from the base slice, the increment is banded under
# the STORED config (planes/bands/dim pinned in TBLPROPERTIES) and
# appended. Banding is a pure per-row function of the config — no
# training — so the two-batch table must equal the one-shot build and
# the one-shot oracle (_SRP_ORACLE) applies verbatim; what the gate
# proves is the persisted store's config round-trip and append path.


@query(
    "q_cosine_topk_srp_incremental",
    oracle=_SRP_ORACLE,
    tags=("llm", "similarity", "scale"),
)
def q_cosine_topk_srp_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.ann_store import (
        append_srp_index,
        create_srp_index,
        srp_index_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"srpindex_{slug}"

    def build():
        create_srp_index(
            spark,
            e.filter(F.expr(_IVF_INCR_PRED)),
            name,
            planes=_SRP_PLANES,
            bands=4,
            dim=_SRP_DIM,
            overwrite=True,
            tag="base",
        )
        append_srp_index(spark, e.filter(~F.expr(_IVF_INCR_PRED)), name, tag="base+inc")
        return spark.table(name).localCheckpoint()

    _memo_artifact(spark, ("srp_index", sf_dir), build)
    return srp_index_topk(spark, name, e.filter(F.col("vec_id") < 10), topk=5)


# Persisted-IVF two-batch replay (operators/ann_store.py): centroids
# trained on the BASE slice only, the increment assigned with those
# STORED centroids and appended, queries probed against the persisted
# table. The oracle re-derives the base-slice training run via
# _kmeans_ctes(train_pred=...) and assigns the FULL corpus with the
# resulting centroids — exactly what the stored table holds, because
# appends never refit.

_IVF_INCR_PRED = "vec_id % 3 <> 0"


def _ivf_incr_oracle(
    k: int = 8, iters: int = _IVF_TRAINED_ITERS, store_pred: str = "TRUE"
) -> str:
    cos = _SQL_COS.format(a="q.embedding", b="v.embedding")
    return (
        _kmeans_ctes(k, iters, train_pred=_IVF_INCR_PRED)
        + f""",
cnorm AS (SELECT cid, SQRT(SUM(val * val)) AS nrm FROM c{iters} GROUP BY cid),
ecos AS (
  SELECT e.vec_id, c.cid, SUM(e.val * c.val) AS dot, SQRT(SUM(e.val * e.val)) AS en
  FROM ev e JOIN c{iters} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
),
sim AS (
  SELECT ec.vec_id, ec.cid, ec.dot / NULLIF(ec.en * n.nrm, 0) AS csim
  FROM ecos ec JOIN cnorm n ON ec.cid = n.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
    FROM sim
  ) t WHERE crk = 1
),
probes AS (
  SELECT vec_id AS query_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
    FROM sim WHERE vec_id < 10
  ) t WHERE crk <= 2
)
SELECT query_id, vec_id, score, rk FROM (
  SELECT p.query_id, a.vec_id,
         ROUND({cos}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {cos} DESC, a.vec_id) AS rk
  FROM probes p
  JOIN assign a ON a.cid = p.cid
  JOIN embeddings v ON v.vec_id = a.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
  WHERE a.vec_id <> p.query_id AND ({store_pred})
) t WHERE rk <= 5
ORDER BY query_id, rk"""
    )


@query(
    "q_cosine_topk_ivf_incremental",
    oracle=_ivf_incr_oracle(),
    tags=("llm", "similarity", "iterative", "scale"),
)
def q_cosine_topk_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.ann_store import (
        append_ivf_index,
        create_ivf_index,
        ivf_index_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"ivfindex_{slug}"

    def build():
        create_ivf_index(
            spark,
            e.filter(F.expr(_IVF_INCR_PRED)),
            name,
            k=8,
            iters=_IVF_TRAINED_ITERS,
            overwrite=True,
            tag="base",
        )
        append_ivf_index(spark, e.filter(~F.expr(_IVF_INCR_PRED)), name, tag="base+inc")
        return spark.table(name).localCheckpoint()

    _memo_artifact(spark, ("ivf_index", sf_dir), build)
    return ivf_index_topk(
        spark, name, e.filter(F.col("vec_id") < 10), topk=5, n_probe=2
    )


# Delete/tombstone replay (ann_store.delete_keys — the takedown /
# opt-out compliance path): the persisted index keeps its data files
# untouched (the delete writes ONLY a key-sidecar table; file-level
# no-rewrite asserted in tests/test_ann_store.py) and every probe
# anti-joins the tombstones out. The gate replays build → delete →
# probe; the oracle is the SAME one-shot oracle with the CANDIDATE
# side restricted to survivors — i.e. the probe must hash-match a
# from-scratch rebuild on the surviving rows. Queries stay
# unrestricted: a deleted vector may still be used as a query, it just
# can't be returned.

_ANN_DEL_PRED = "vec_id % 5 = 0"


@query(
    "q_ann_srp_delete",
    oracle=_srp_oracle(store_pred="v.vec_id % 5 <> 0"),
    tags=("llm", "similarity", "scale", "delete"),
)
def q_ann_srp_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.ann_store import (
        create_srp_index,
        delete_keys,
        srp_index_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"srpindex_{slug}_del"

    def build():
        create_srp_index(
            spark, e, name, planes=_SRP_PLANES, bands=4, dim=_SRP_DIM,
            overwrite=True, tag="full",
        )
        delete_keys(spark, name, e.filter(F.expr(_ANN_DEL_PRED)).select("vec_id"))
        return spark.table(name).localCheckpoint()

    _memo_artifact(spark, ("srp_index_del", sf_dir), build)
    return srp_index_topk(spark, name, e.filter(F.col("vec_id") < 10), topk=5)


@query(
    "q_ann_ivf_delete",
    oracle=_ivf_incr_oracle(store_pred="a.vec_id % 5 <> 0"),
    tags=("llm", "similarity", "iterative", "scale", "delete"),
)
def q_cosine_topk_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same two-batch build as q_cosine_topk_ivf_incremental (centroids
    trained on the base slice, stored, never refit by append OR
    delete), then a takedown slice is tombstoned before probing."""
    from rspl_spark.operators.ann_store import (
        append_ivf_index,
        create_ivf_index,
        delete_keys,
        ivf_index_topk,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"ivfindex_{slug}_del"

    def build():
        create_ivf_index(
            spark, e.filter(F.expr(_IVF_INCR_PRED)), name,
            k=8, iters=_IVF_TRAINED_ITERS, overwrite=True, tag="base",
        )
        append_ivf_index(spark, e.filter(~F.expr(_IVF_INCR_PRED)), name, tag="base+inc")
        delete_keys(spark, name, e.filter(F.expr(_ANN_DEL_PRED)).select("vec_id"))
        return spark.table(name).localCheckpoint()

    _memo_artifact(spark, ("ivf_index_del", sf_dir), build)
    return ivf_index_topk(
        spark, name, e.filter(F.col("vec_id") < 10), topk=5, n_probe=2
    )


# Embedding-cosine pair mining under cluster blocking: assign every
# vector to its nearest trained-k-means cell, self-join WITHIN cells
# only, keep pairs with cosine >= threshold. This is the standard
# cluster-then-compare near-dup pattern for embedding corpora: the
# all-pairs O(n²) collapses to sum over cells of O(n_c²), and the cell
# id keys the shuffle so each cell's comparisons are one partition-local
# task. The blocking is part of the query's SEMANTICS (both engines
# compute the same deterministic cells), so the result is exactly
# verifiable — unlike recall-based ANN, nothing here is approximate.

_EMB_PAIR_THRESHOLD = 0.4


def _embedding_pairs_oracle(k: int = 8, iters: int = _IVF_TRAINED_ITERS) -> str:
    cos = _SQL_COS.format(a="ea.embedding", b="eb.embedding")
    return (
        _kmeans_ctes(k, iters)
        + f""",
dist AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS d2
  FROM ev e JOIN c{iters} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
    FROM dist
  ) t WHERE rk = 1
)
SELECT vec_a, vec_b, score FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ROUND({cos}, 6) AS score
  FROM assign a
  JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
) t
WHERE score >= {_EMB_PAIR_THRESHOLD}
ORDER BY vec_a, vec_b"""
    )


@query(
    "q_embedding_cosine_pairs",
    oracle=_embedding_pairs_oracle(),
    tags=("llm", "similarity", "dedup", "iterative"),
)
def q_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-embedding pairs via k-means cell blocking + in-cell BLAS.

    The in-cell pairing is one applyInPandas matrix multiply per cell
    (cell_cosine_pairs) instead of a self-join — the arrays cross the
    shuffle once per ROW, not once per PAIR, and the kernel pre-filters
    at threshold − 1e-6 so only survivors return (the exact HALF_UP
    round + threshold stays Spark-side, unchanged vs the oracle).
    Measured 3x faster than the self-join form at sf0.1.
    """
    from rspl_spark.operators.similarity import (
        cell_cosine_pairs,
        kmeans_assign,
        kmeans_fit,
    )

    e = load(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, iters=_IVF_TRAINED_ITERS)
    assign = kmeans_assign(e, cents).select("vec_id", "cid")
    prepped = _with_unit_prep(e, "vec_id", "emb", "nrm").join(assign, "vec_id")
    # metadata-only count (unfiltered parquet) feeds the kernel's
    # scale-aware parallelism pin: small corpora skip the extra
    # repartition (r13: +4-8% here), big ones pin capped at the cell count
    pairs = cell_cosine_pairs(
        prepped, min_raw=_EMB_PAIR_THRESHOLD - 1e-6,
        est_rows=e.count(), n_cells=8,
    )
    return (
        pairs.select(
            F.col("vec_id_a").alias("vec_a"),
            F.col("vec_id_b").alias("vec_b"),
            F.round("raw_score", 6).alias("score"),
        )
        .filter(F.col("score") >= _EMB_PAIR_THRESHOLD)
        .orderBy("vec_a", "vec_b")
    )


# Embedding near-dup: nearest neighbor per vector (brute force at test SF;
# the IVF/LSH candidate path applies unchanged at scale).

_NN_ORACLE = f"""
SELECT vec_id, nn_id, score FROM (
  SELECT a.vec_id, b.vec_id AS nn_id,
         ROUND({_SQL_COS.format(a="a.embedding", b="b.embedding")}, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY a.vec_id
                            ORDER BY {_SQL_COS.format(a="a.embedding", b="b.embedding")} DESC,
                                     b.vec_id) AS rk
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id
) t WHERE rk = 1
ORDER BY vec_id
"""


# Shared per-side cosine prep lives in operators.similarity.unit_prep;
# the module-local name is kept for the many call sites below.
_with_unit_prep = unit_prep


@query("q_embedding_nearest_neighbor", oracle=_NN_ORACLE, tags=("llm", "similarity", "dedup"))
def q_embedding_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest neighbor — DECLARED all-pairs semantics; this is the
    oracle/recall anchor for the ANN queries and must not be pointed at a
    corpus-scale table (the guarded exact_scored_pairs operator makes
    that explicit; the scale paths are IVF/SRP/trained-cell blocking)."""
    e = load(spark, sf_dir, "embeddings")
    # Higher-order-function expressions (the per-pair dot) are interpreted,
    # not codegen'd — and the small parquet arrives as ONE partition, so
    # the broadcast-NL join would run single-threaded. Spread the streamed
    # side so the O(n²) scoring parallelizes.
    a = _with_unit_prep(e, "vec_id", "a_emb", "a_nrm").repartition(32)
    b = _with_unit_prep(e, "nn_id", "b_emb", "b_nrm")
    scored = exact_scored_pairs(
        a, b, "raw_score", allow_quadratic=True, broadcast_probes=False
    ).filter(F.col("vec_id") != F.col("nn_id"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("raw_score"), F.asc("nn_id"))
    return (
        scored.select("vec_id", "nn_id", "raw_score")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "nn_id", F.round("raw_score", 6).alias("score"))
        .orderBy("vec_id")
    )


# Int8 symmetric quantization of embeddings (the 4x-memory-compression
# path for ANN at scale): per-vector scale = max|x| / 127; outputs are
# scalarized for hashing (quantized coords 1..4 + reconstruction error).

_QUANT_ORACLE = """
SELECT vec_id,
       ROUND(scale, 6) AS scale,
       CAST(FLOOR(CAST(embedding[1] AS DOUBLE) / scale + 0.5) AS BIGINT) AS q1,
       CAST(FLOOR(CAST(embedding[2] AS DOUBLE) / scale + 0.5) AS BIGINT) AS q2,
       CAST(FLOOR(CAST(embedding[3] AS DOUBLE) / scale + 0.5) AS BIGINT) AS q3,
       ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
             x -> ABS(CAST(x AS DOUBLE) - FLOOR(CAST(x AS DOUBLE) / scale + 0.5) * scale))), 6)
         AS recon_err
FROM (
  SELECT vec_id, embedding,
         NULLIF(LIST_MAX(LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)))) / 127.0, 0.0) AS scale
  FROM embeddings
) t
ORDER BY vec_id
"""


@query("q_embedding_quantize_int8", oracle=_QUANT_ORACLE, tags=("llm", "similarity"))
def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # NULLIF: a zero vector would make scale 0 and every division raise
    # under ANSI mode — null quantization is the defined answer.
    scale = F.nullif(
        F.array_max(F.transform(dbl, lambda x: F.abs(x))) / 127.0, F.lit(0.0)
    )
    # NOTE the staged column is "scale_raw", NOT "scale": if the output
    # alias shares the input column's name, outer references inside
    # higher-order-function lambdas resolve to the (rounded) sibling
    # alias instead of the input column — a silent value change.
    staged = e.select("vec_id", "embedding", scale.alias("scale_raw"))
    # floor(x + 0.5), not round(): Spark rounds HALF_UP, DuckDB's double
    # rounding differs at exact .5 — floor form is engine-identical.
    qc = lambda i: F.floor(
        F.element_at(F.col("embedding"), i).cast("double") / F.col("scale_raw") + 0.5
    ).cast("long")
    recon = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.abs(
                x.cast("double")
                - F.floor(x.cast("double") / F.col("scale_raw") + 0.5) * F.col("scale_raw")
            ),
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return staged.select(
        "vec_id",
        F.round("scale_raw", 6).alias("scale"),
        qc(1).alias("q1"),
        qc(2).alias("q2"),
        qc(3).alias("q3"),
        F.round(recon, 6).alias("recon_err"),
    ).orderBy("vec_id")


# BPE-style pre-tokenization (SURVEY §2.2 "token counting: whitespace +
# a BPE-ish regex"): letter runs / digit runs / punctuation runs —
# lookahead-free so the same pattern runs in Spark (Java regex) and
# DuckDB (RE2).

_BPE_ORACLE = r"""
SELECT doc_id,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\s+')) AS BIGINT) AS n_ws_tokens,
       ARRAY_TO_STRING(LIST_SLICE(
         REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'), 1, 5), '|')
         AS first5
FROM documents
ORDER BY doc_id
"""


@query("q_bpe_style_tokens", oracle=_BPE_ORACLE, tags=("llm", "text"))
def q_bpe_style_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"
    toks = F.regexp_extract_all(F.col("text"), F.lit(pat), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
        F.concat_ws("|", F.slice(toks, 1, 5)).alias("first5"),
    ).orderBy("doc_id")


# Per-label centroids (the "training" half of IVF / one k-means step):
# posexplode to (label, dim, value), average per cell. Shuffle keyed on
# (label, dim) — fully parallel at any scale.

_CENTROID_ORACLE = """
SELECT label, dim, ROUND(AVG(val), 6) AS centroid, COUNT(*) AS n_vecs FROM (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
) t
WHERE dim <= 8
GROUP BY label, dim
ORDER BY label, dim
"""


@query("q_embedding_centroids", oracle=_CENTROID_ORACLE, tags=("llm", "similarity"))
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "val")
    ).select("label", (F.col("pos") + 1).cast("long").alias("dim"), F.col("val").cast("double").alias("val"))
    return (
        exploded.groupBy("label", "dim")
        .agg(F.avg("val").alias("c_raw"), F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("dim") <= 8)
        .select("label", "dim", F.round("c_raw", 6).alias("centroid"), "n_vecs")
        .orderBy("label", "dim")
    )


# K-means assignment after 3 Lloyd iterations (deterministic init =
# first k vectors by id). The oracle re-derives the FULL algorithm
# independently in SQL — init, 3 unrolled assignment/update rounds
# (empty clusters keep their previous centroid, matching kmeans_fit),
# final assignment — so this is a hash-checked gate query, not a
# rows-only one. Ties in argmin break to the lowest cid on both sides.


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    return (
        _kmeans_ctes(k, iters)
        + f""",
dfin AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM ev e JOIN c{iters} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
)
SELECT vec_id, cid, ROUND(dist, 6) AS dist2 FROM (
  SELECT vec_id, cid, dist,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
  FROM dfin
) t WHERE rk = 1
ORDER BY vec_id"""
    )


@query("q_kmeans_assign", oracle=_kmeans_oracle(), tags=("llm", "similarity", "iterative"))
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import kmeans_assign, kmeans_fit

    e = load(spark, sf_dir, "embeddings")
    centroids = kmeans_fit(e, k=8, iters=3)
    return (
        kmeans_assign(e, centroids)
        .select("vec_id", F.col("cid").cast("long").alias("cid"), "dist2")
        .orderBy("vec_id")
    )


# Multimodal feature extraction in the gate. Payloads are synthesized
# from documents so the query runs on the standard testdata. The fake
# decoder's hash chain runs over hex strings precisely so DuckDB can
# recompute it (sha256() is VARCHAR-only there) — full hash check, not
# rows-only.

_MULTIMODAL_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         encode(text) AS payload
  FROM documents
), s AS (
  SELECT media_id, kind,
         CAST(octet_length(payload) AS BIGINT) AS n_bytes,
         CASE WHEN octet_length(payload) = 0 THEN '00'
              ELSE lower(hex(payload)) END AS seed
  FROM m
), i1 AS (SELECT *, sha256('0' || seed) AS b1 FROM s),
   i2 AS (SELECT *, sha256('1' || b1) AS b2 FROM i1),
   i3 AS (SELECT *, sha256('2' || b2) AS b3 FROM i2),
   i4 AS (SELECT *, sha256('3' || b3) AS b4 FROM i3)
SELECT media_id, kind, CAST(256 AS INTEGER) AS feat_dim,
       md5(b1 || b2 || b3 || b4) AS feature, n_bytes
FROM i4 ORDER BY media_id
"""


@query("q_multimodal_features", oracle=_MULTIMODAL_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import extract_features, fake_image_decode

    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(48).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(90).alias("n_frames"),
            F.lit("syn").alias("format"),
        ).alias("meta"),
    )
    return extract_features(media, decode=fake_image_decode).orderBy("media_id")


# Multimodal resize stage: binary->binary mapInPandas that preserves the
# media schema (payload replaced, meta.width/height updated) so resize
# composes with decode/feature stages. The fake kernel is the same
# hex-string sha256 device as fake_image_decode, so DuckDB replays it.

_MULTIMODAL_RESIZE_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
              WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         encode(text) AS payload
  FROM documents
), s AS (
  SELECT media_id, kind,
         CASE WHEN octet_length(payload) = 0 THEN '00'
              ELSE lower(hex(payload)) END AS seed,
         octet_length(payload) AS raw_len
  FROM m
)
SELECT media_id, kind,
       CASE WHEN kind IN ('image', 'video') THEN 64 ELSE -1 END AS width,
       CASE WHEN kind IN ('image', 'video') THEN 48 ELSE -1 END AS height,
       CASE WHEN kind IN ('image', 'video')
            THEN sha256('64x48:' || seed)
            ELSE CAST(raw_len AS VARCHAR) END AS resized,
       CAST(CASE WHEN kind IN ('image', 'video') THEN 64 ELSE raw_len END AS BIGINT)
         AS n_bytes
FROM s ORDER BY media_id
"""


@query("q_multimodal_resize", oracle=_MULTIMODAL_RESIZE_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import fake_resize, resize_media

    d = load(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(90).alias("n_frames"),
            F.lit("syn").alias("format"),
        ).alias("meta"),
    )
    resized = resize_media(media, 64, 48, kernel=fake_resize)
    is_visual = F.col("kind").isin("image", "video")
    return resized.select(
        "media_id",
        "kind",
        F.when(is_visual, F.col("meta.width")).otherwise(F.lit(-1)).alias("width"),
        F.when(is_visual, F.col("meta.height")).otherwise(F.lit(-1)).alias("height"),
        F.when(is_visual, F.decode(F.col("payload"), "UTF-8"))
        .otherwise(F.length(F.col("payload")).cast("string"))
        .alias("resized"),
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
    ).orderBy("media_id")


# REAL codec in the gate: each 'image' document becomes a genuine P5
# PGM file (header built expression-side: dims vary per doc, raster =
# ASCII bytes of repeated md5 hex) and decode_pgm — the pure-numpy
# parser, no stand-in — reads dimensions and pixels back OUT OF THE
# HEADER AND RASTER. The oracle recomputes the expected features from
# the same construction (it knows what was packed), so a parser that
# misreads the header, mis-slices the raster, or mis-shapes the array
# hash-fails. This de-stubs the multimodal decode path end-to-end.

_PGM_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 + doc_id % 5 AS INTEGER) AS width,
         CAST(3 + doc_id % 4 AS INTEGER) AS height,
         SUBSTR(REPEAT(MD5(text), 2), 1,
                CAST((4 + doc_id % 5) * (3 + doc_id % 4) AS INTEGER)) AS px
  FROM documents WHERE doc_id % 3 = 0
)
SELECT media_id, width, height, CAST(255 AS INTEGER) AS maxval,
       CAST(width * height AS BIGINT) AS n_pixels,
       LIST_AGGREGATE(
         LIST_TRANSFORM(RANGE(1, width * height + 1), i -> ASCII(SUBSTR(px, i, 1))),
         'avg') AS mean_gray,
       MD5(px) AS pixel_md5
FROM m ORDER BY media_id
"""


@query("q_multimodal_decode_pgm", oracle=_PGM_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_decode_pgm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import pgm_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    w = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    h = (F.lit(3) + F.col("doc_id") % 4).cast("int")
    header = F.concat_ws(
        "", F.lit("P5\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )
    px = F.expr(
        "substring(repeat(md5(text), 2), 1, "
        "cast((4 + doc_id % 5) * (3 + doc_id % 4) as int))"
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.encode(header, "UTF-8"), F.encode(px, "UTF-8")).alias("payload"),
    )
    return pgm_features(media).orderBy("media_id")


# REAL audio codec in the gate: each 'audio' document becomes a genuine
# RIFF/WAVE file (44-byte PCM header assembled expression-side —
# little-endian size/rate fields built byte-by-byte with shift/unhex;
# samples = ASCII bytes of repeated md5 hex as 8-bit unsigned PCM) and
# decode_wav — the pure-numpy RIFF chunk walker, no stand-in — reads
# rate, width, and frame count back OUT OF THE HEADER. The oracle
# recomputes expected features from the same construction, so a decoder
# that misparses the chunk list, the fmt fields, or the sample bytes
# hash-fails. Audio joins PGM as the second de-stubbed modality.


def _le_bytes(x, n_bytes: int):
    """Column<binary>: integer column as n little-endian bytes."""
    parts = [
        F.lpad(F.hex(F.shiftright(x.cast("long"), 8 * i).bitwiseAND(F.lit(0xFF))), 2, "0")
        for i in range(n_bytes)
    ]
    return F.unhex(F.concat(*parts))


_WAV_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(16 + doc_id % 32 AS BIGINT) AS n,
         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS rate,
         SUBSTR(REPEAT(MD5(text), 2), 1, CAST(16 + doc_id % 32 AS INTEGER)) AS px
  FROM documents WHERE doc_id % 5 = 1
)
SELECT media_id, rate AS sample_rate, CAST(1 AS INTEGER) AS n_channels,
       CAST(8 AS INTEGER) AS bits, n AS n_samples,
       ROUND(n * 1000.0 / rate, 6) AS duration_ms,
       LIST_AGGREGATE(
         LIST_TRANSFORM(RANGE(1, CAST(n AS INTEGER) + 1), i -> ASCII(SUBSTR(px, i, 1))),
         'avg') AS mean_amp,
       MD5(px) AS sample_md5
FROM m ORDER BY media_id
"""


@query("q_multimodal_decode_wav", oracle=_WAV_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import wav_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 1)
    n = (F.lit(16) + F.col("doc_id") % 32).cast("int")
    rate = (F.lit(8000) + (F.col("doc_id") % 3) * 4000).cast("int")
    px = F.expr(
        "substring(repeat(md5(text), 2), 1, cast(16 + doc_id % 32 as int))"
    )
    header = F.concat(
        F.lit(b"RIFF"),
        _le_bytes(n + 36, 4),  # RIFF chunk size = 36 + data bytes
        F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 4),  # fmt chunk size
        _le_bytes(F.lit(1), 2),  # PCM
        _le_bytes(F.lit(1), 2),  # mono
        _le_bytes(rate, 4),  # sample rate
        _le_bytes(rate, 4),  # byte rate (rate * channels * width)
        _le_bytes(F.lit(1), 2),  # block align
        _le_bytes(F.lit(8), 2),  # bits per sample
        F.lit(b"data"),
        _le_bytes(n, 4),  # data chunk size
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode(px, "UTF-8")).alias("payload"),
    )
    feats = wav_features(media)
    return feats.withColumn("duration_ms", F.round("duration_ms", 6)).orderBy("media_id")


# REAL codec #3 in the gate: genuine 24-bit BMP files built
# expression-side (BITMAPFILEHEADER + BITMAPINFOHEADER via the same
# little-endian byte builder; widths chosen multiple of 4 so rows need
# no pad bytes, raster = ASCII bytes of repeated md5 hex, stored
# bottom-up/BGR per spec) and decode_bmp normalizes to top-down RGB.
# The oracle replays the normalization INDEX-FOR-INDEX — the pixel_md5
# is the md5 of the flipped, channel-swapped block, so a decoder that
# forgets the vertical flip or the BGR swap hash-fails, not just one
# that misreads the header.

_BMP_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 * (1 + doc_id % 3) AS BIGINT) AS w,
         CAST(2 + doc_id % 3 AS BIGINT) AS h,
         SUBSTR(REPEAT(MD5(text), 5), 1,
                CAST(3 * 4 * (1 + doc_id % 3) * (2 + doc_id % 3) AS INTEGER)) AS px
  FROM documents WHERE doc_id % 5 = 2
),
rgb AS (
  SELECT media_id, w, h, px,
         ARRAY_TO_STRING(
           LIST_TRANSFORM(
             RANGE(0, 3 * w * h),
             o -> SUBSTR(px,
                         CAST(((h - 1 - o // (3 * w)) * w + (o % (3 * w)) // 3) * 3
                              + (2 - o % 3) + 1 AS INTEGER),
                         1)),
           '') AS norm
  FROM m
)
SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(w * h AS BIGINT) AS n_pixels,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i + 2, 1))), 'avg') AS mean_r,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i + 1, 1))), 'avg') AS mean_g,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i, 1))), 'avg') AS mean_b,
       MD5(norm) AS pixel_md5
FROM rgb ORDER BY media_id
"""


@query("q_multimodal_decode_bmp", oracle=_BMP_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import bmp_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 2)
    w = (F.lit(4) * (F.lit(1) + F.col("doc_id") % 3)).cast("long")
    h = (F.lit(2) + F.col("doc_id") % 3).cast("long")
    nbytes = (F.lit(3) * w * h).cast("long")
    px = F.expr(
        "substring(repeat(md5(text), 5), 1, "
        "cast(3 * 4 * (1 + doc_id % 3) * (2 + doc_id % 3) as int))"
    )
    header = F.concat(
        F.lit(b"BM"),
        _le_bytes(nbytes + 54, 4),  # file size
        _le_bytes(F.lit(0), 4),  # reserved
        _le_bytes(F.lit(54), 4),  # pixel data offset
        _le_bytes(F.lit(40), 4),  # BITMAPINFOHEADER size
        _le_bytes(w, 4),  # width
        _le_bytes(h, 4),  # height (positive → bottom-up)
        _le_bytes(F.lit(1), 2),  # planes
        _le_bytes(F.lit(24), 2),  # bits per pixel
        _le_bytes(F.lit(0), 4),  # BI_RGB
        _le_bytes(nbytes, 4),  # image size
        _le_bytes(F.lit(0), 4),  # x ppm
        _le_bytes(F.lit(0), 4),  # y ppm
        _le_bytes(F.lit(0), 4),  # palette colors
        _le_bytes(F.lit(0), 4),  # important colors
    )
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode(px, "UTF-8")).alias("payload"),
    )
    return bmp_features(media).orderBy("media_id")


# REAL codec #4 in the gate: genuine PNG files — zlib IS in this
# container, so DEFLATE-based PNG is not env-blocked the way JPEG is.
# Pixels are the ASCII bytes of repeated md5 hex (same deterministic
# construction as the BMP gate), ENCODED to real PNGs in a pandas
# kernel with the scanline filter CYCLING through all five types
# (None/Sub/Up/Average/Paeth per row), then decoded back by the
# pure-numpy inflate+unfilter path. The oracle recomputes the expected
# stats from the construction directly — pixel_md5 = MD5(px) — so a
# decoder that gets ANY filter's reconstruction wrong (or the encoder
# that produced it) hash-fails on every image taller than its filter
# period, not just on header parsing.

_PNG_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(4 * (1 + doc_id % 3) AS BIGINT) AS w,
         CAST(2 + doc_id % 4 AS BIGINT) AS h,
         SUBSTR(REPEAT(MD5(text), 6), 1,
                CAST(3 * 4 * (1 + doc_id % 3) * (2 + doc_id % 4) AS INTEGER)) AS px
  FROM documents WHERE doc_id % 5 = 3
)
SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels,
       CAST(w * h AS BIGINT) AS n_pixels,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i, 1))), 'avg') AS mean_r,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i + 1, 1))), 'avg') AS mean_g,
       LIST_AGGREGATE(LIST_TRANSFORM(RANGE(1, CAST(3 * w * h AS INTEGER) + 1, 3),
                                     i -> ASCII(SUBSTR(px, i + 2, 1))), 'avg') AS mean_b,
       MD5(px) AS pixel_md5
FROM m ORDER BY media_id
"""


@query("q_multimodal_decode_png", oracle=_PNG_ORACLE, tags=("llm", "multimodal"))
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as _np
    import pandas as _pd

    from rspl_spark.operators.multimodal import encode_png, png_features

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 3)
    src = d.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(4) * (F.lit(1) + F.col("doc_id") % 3)).cast("int").alias("w"),
        (F.lit(2) + F.col("doc_id") % 4).cast("int").alias("h"),
        F.expr(
            "substring(repeat(md5(text), 6), 1, "
            "cast(3 * 4 * (1 + doc_id % 3) * (2 + doc_id % 4) as int))"
        ).alias("px"),
    )

    def build(batches):
        for pdf in batches:
            payloads = []
            for w, h, px in zip(pdf["w"], pdf["h"], pdf["px"]):
                arr = _np.frombuffer(px.encode("ascii"), dtype=_np.uint8)
                payloads.append(
                    encode_png(arr.reshape(h, w, 3), row_filters=(0, 1, 2, 3, 4))
                )
            yield _pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    media = src.mapInPandas(build, schema="media_id long, payload binary")
    return png_features(media).orderBy("media_id")


# Metadata-driven multimodal ops: frame-sampling plan (explode frame
# indices from meta.n_frames — payload never read) and the per-kind
# metadata rollup. Meta varies per doc so the queries exercise real
# arithmetic; the plan-pruning property (payload not in ReadSchema) is
# asserted in test_multimodal.py.


def _varied_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (320 + (F.col("doc_id") % 5) * 64).cast("int").alias("width"),
            (240 + (F.col("doc_id") % 5) * 48).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (30 + F.col("doc_id") % 90).cast("int").alias("n_frames"),
            F.lit("syn").alias("format"),
        ).alias("meta"),
    )


_FRAME_SAMPLE_ORACLE = """
SELECT media_id, CAST(UNNEST(GENERATE_SERIES(0, n_frames - 1, 10)) AS BIGINT) AS frame_idx
FROM (SELECT doc_id AS media_id, CAST(30 + doc_id % 90 AS INTEGER) AS n_frames
      FROM documents WHERE doc_id % 3 = 2) v
ORDER BY media_id, frame_idx
"""


@query("q_media_frame_sample", oracle=_FRAME_SAMPLE_ORACLE, tags=("llm", "multimodal"))
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import frame_sample_plan

    plan = frame_sample_plan(_varied_media(spark, sf_dir), every_n=10)
    return plan.select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    ).orderBy("media_id", "frame_idx")


_MEDIA_STATS_ORACLE = """
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(width), 6) AS avg_width,
       ROUND(AVG(n_frames), 6) AS avg_frames
FROM (SELECT CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
             WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             320 + (doc_id % 5) * 64 AS width,
             30 + doc_id % 90 AS n_frames
      FROM documents) m
GROUP BY kind
ORDER BY kind
"""


@query("q_media_stats", oracle=_MEDIA_STATS_ORACLE, tags=("llm", "multimodal"))
def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.multimodal import media_stats

    stats = media_stats(_varied_media(spark, sf_dir))
    return stats.select(
        "kind",
        F.col("n").cast("long").alias("n"),
        F.round("avg_width", 6).alias("avg_width"),
        F.round("avg_frames", 6).alias("avg_frames"),
    ).orderBy("kind")


# Benchmark-contamination check: training docs sharing word 3-shingles
# with a held-out benchmark set (here: doc_id < 10). The decontamination
# pass every training-data pipeline runs before release. Scale shape:
# the benchmark shingle set is tiny → broadcast; the corpus side
# explodes shingles once and semi-aggregates per doc — no all-pairs.

_CONTAMINATION_ORACLE = f"""
WITH cs AS (
  SELECT doc_id, UNNEST(sh) AS s
  FROM {_sql_sig_source()} src
),
bs AS (
  SELECT DISTINCT s FROM cs WHERE doc_id < 10
)
SELECT c.doc_id, CAST(COUNT(DISTINCT c.s) AS BIGINT) AS n_shared_shingles
FROM cs c JOIN bs ON c.s = bs.s
WHERE c.doc_id >= 10
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


@query("q_contamination", oracle=_CONTAMINATION_ORACLE, tags=("llm", "dedup"))
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.dedup import with_hashed_shingles

    d = load(spark, sf_dir, "documents")
    # one materialization of the shingle table — both the benchmark and
    # corpus branches read it, and the md5 shingle expression is the
    # expensive part (same pattern as the LSH signature table)
    sh = _memo_artifact(spark, ("shingles", sf_dir), lambda: with_hashed_shingles(d))
    corpus = sh.select("doc_id", F.explode("sh").alias("s"))
    bench = (
        corpus.filter(F.col("doc_id") < 10).select("s").distinct()
    )
    return (
        corpus.filter(F.col("doc_id") >= 10)
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        # count(*), NOT countDistinct: sh is array_distinct'd per doc
        # (with_hashed_shingles), so (doc_id, s) pairs are unique and
        # the broadcast-joined bench side is .distinct() — equal
        # integers, minus countDistinct's partial-distinct expand over
        # the exploded shingles (the dedup.py:237 rule).
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


# Deterministic train/val/test split: assignment by CONTENT HASH, not
# randomness — reproducible across runs, machines, and engines, and
# stable under re-partitioning (the property rand()-based splits lack).
# 90/5/5 by portable hash of the document text.

_SPLIT_ORACLE = f"""
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))) AS BIGINT) AS n_tokens
FROM (
  SELECT text,
         CASE WHEN {_sql_hash("text")} % 100 < 90 THEN 'train'
              WHEN {_sql_hash("text")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) t
GROUP BY split
ORDER BY split
"""


@query("q_deterministic_split", oracle=_SPLIT_ORACLE, tags=("llm", "text"))
def q_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = portable_hash(F.col("text")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        d.select(split.alias("split"), toks.alias("nt"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .orderBy("split")
    )


# Token packing: assign documents to fixed-budget context windows (bins)
# by running token count — the standard sequence-packing approximation
# (greedy in doc_id order, bin = floor(cumulative_before / budget)).
# One window pass partitioned by source. Packing is inherently
# sequential WITHIN a partition key; at 100 TB a handful of giant
# sources would serialize — q_token_packing_sharded below is the
# production form, keying the window by (source, hash(doc_id) %
# n_shards) at the cost of at most one underfilled trailing bin per
# shard. This per-source form stays as the exact-sequence baseline.

_PACK_BUDGET = 2048

_PACK_ORACLE = f"""
SELECT source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS bin_tokens
FROM (
  SELECT source, doc_id, nt,
         CAST((SUM(nt) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt)
              // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM (SELECT source, doc_id,
               LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS nt
        FROM documents) t
) p
GROUP BY source, bin
ORDER BY source, bin
"""


@query("q_token_packing", oracle=_PACK_ORACLE, tags=("llm", "text"))
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select("source", "doc_id", nt.alias("nt")).withColumn(
        "bin", ((F.sum("nt").over(w) - F.col("nt")) / _PACK_BUDGET).cast("long")
    )
    return (
        binned.groupBy("source", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("bin_tokens"),
        )
        .orderBy("source", "bin")
    )


# Sharded token packing: the 100 TB form of the packer above. Keying the
# running sum by (source, hash(doc_id) % n_shards) bounds every window
# partition to 1/n_shards of a source, so a handful of giant sources no
# longer serialize onto single tasks; the cost is at most one underfilled
# trailing bin per shard. The shard hash is the portable md5 hash, so the
# oracle replays the exact same document-to-shard assignment and greedy
# sequence.

_PACK_SHARDS = 4

_PACK_SHARDED_ORACLE = f"""
SELECT source, shard, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS bin_tokens
FROM (
  SELECT source, shard, doc_id, nt,
         CAST((SUM(nt) OVER (PARTITION BY source, shard ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt)
              // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM (SELECT source,
               CAST({_sql_hash("CAST(doc_id AS VARCHAR)")} % {_PACK_SHARDS} AS BIGINT) AS shard,
               doc_id,
               LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS nt
        FROM documents) t
) p
GROUP BY source, shard, bin
ORDER BY source, shard, bin
"""


@query("q_token_packing_sharded", oracle=_PACK_SHARDED_ORACLE, tags=("llm", "text"))
def q_token_packing_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    shard = (portable_hash(F.col("doc_id").cast("string")) % _PACK_SHARDS).cast("long")
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "source", shard.alias("shard"), F.col("doc_id"), nt.alias("nt")
    ).withColumn(
        "bin", ((F.sum("nt").over(w) - F.col("nt")) / _PACK_BUDGET).cast("long")
    )
    return (
        binned.groupBy("source", "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("long").alias("bin_tokens"),
        )
        .orderBy("source", "shard", "bin")
    )


# ---------------------------------------------------------------------------
# Text analysis: token counting, quality scoring, language ID heuristic,
# document fingerprinting. All scalar codegen'd expressions.
# ---------------------------------------------------------------------------

# single source of truth: constants come from the operator library so the
# oracle SQL and Spark implementation can never drift
from rspl_spark.operators.text import LANG_MARKERS as _LANG_MARKERS_SRC
from rspl_spark.operators.text import STOPWORDS as _STOPWORDS

_STOPWORDS = tuple(_STOPWORDS)

_TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+')) AS BIGINT) AS n_words,
       ROUND(CAST(LEN(REPLACE(text, ' ', '')) AS DOUBLE) / NULLIF(LENGTH(text), 0), 6) AS nonspace_ratio,
       ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(text), '\\s+'),
                   t -> LIST_CONTAINS({list(_STOPWORDS)}, t))) AS DOUBLE)
             / GREATEST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')), 1), 6) AS stopword_ratio,
       ROUND(CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE)
             / LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))), 6) AS repetition
FROM documents
ORDER BY doc_id
"""


@query("q_text_stats", oracle=_TEXT_STATS_ORACLE, tags=("llm", "text"))
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import text_stats

    return text_stats(load(spark, sf_dir, "documents")).orderBy("doc_id")


# Quality score: weighted combination of the stats — the "keep or drop"
# signal of a training-data pipeline.

_QUALITY_SQL_EXPR = """ROUND(LEAST(1.0, CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE) / 60)
               * 0.5
               + (1.0 - LEAST(1.0, CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE)
                                   / GREATEST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))), 1) / 5))
               * 0.5, 6)"""

_QUALITY_ORACLE = f"""
SELECT doc_id, quality,
       CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS keep
FROM (
  SELECT doc_id, {_QUALITY_SQL_EXPR} AS quality
  FROM documents
) t
ORDER BY doc_id
"""


@query("q_text_quality", oracle=_QUALITY_ORACLE, tags=("llm", "text"))
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import quality_score

    return quality_score(load(spark, sf_dir, "documents")).orderBy("doc_id")


# Language ID: n-gram/stopword-hit heuristic with a deterministic argmax.

_LANG_MARKERS = _LANG_MARKERS_SRC


def _lang_hits_sql(lang: str) -> str:
    words = _LANG_MARKERS[lang]
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
        f"t -> LIST_CONTAINS({list(words)}, t)))"
    )


_LANG_CASE_SQL = (
    "CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en' "
    "WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de' "
    "WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr' "
    "WHEN es_hits > 0 THEN 'es' "
    "ELSE 'unknown' END"
)


_LANGID_ORACLE = f"""
SELECT doc_id,
       CAST(en_hits AS BIGINT) AS en_hits, CAST(de_hits AS BIGINT) AS de_hits,
       CAST(fr_hits AS BIGINT) AS fr_hits, CAST(es_hits AS BIGINT) AS es_hits,
       {_LANG_CASE_SQL} AS pred_lang
FROM (
  SELECT doc_id,
         {_lang_hits_sql("en")} AS en_hits,
         {_lang_hits_sql("de")} AS de_hits,
         {_lang_hits_sql("fr")} AS fr_hits,
         {_lang_hits_sql("es")} AS es_hits
  FROM documents
) t
ORDER BY doc_id
"""


# End-to-end corpus-cleaning pipeline — the canonical training-data
# prep flow (quality filter → language filter → normalized dedup) FUSED
# into one scan: the signals are column expressions (operators/text.py
# exposes them as expression builders), so there are no self-joins of
# operator outputs; the only shuffle is the dedup window on the
# normalization hash. At 100 TB this is one pass over the corpus plus
# one hash-partitioned exchange.


def _pipeline_oracle() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id,
         {_QUALITY_SQL_EXPR} AS quality,
         {_lang_hits_sql("en")} AS en_hits,
         {_lang_hits_sql("de")} AS de_hits,
         {_lang_hits_sql("fr")} AS fr_hits,
         {_lang_hits_sql("es")} AS es_hits,
         CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
         MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g'))) AS norm_h
  FROM documents
), lang AS (
  SELECT *,
         {_LANG_CASE_SQL} AS pred_lang
  FROM scored
), kept AS (
  SELECT * FROM lang WHERE quality >= 0.5 AND pred_lang = 'en'
)
SELECT doc_id, quality, pred_lang, n_tokens FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY norm_h ORDER BY doc_id) AS rk FROM kept
) t WHERE rk = 1
ORDER BY doc_id"""


@query("q_corpus_clean_pipeline", oracle=_pipeline_oracle(), tags=("llm", "text", "dedup"))
def q_corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter, language-filter, and normalize-dedup a corpus in
    one fused pass (see module comment above for the scale shape)."""
    from rspl_spark.operators.text import lang_pred_expr, quality_expr

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    scored = d.select(
        "doc_id",
        quality_expr().alias("quality"),
        lang_pred_expr().alias("pred_lang"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.md5(norm).alias("norm_h"),
    )
    kept = scored.filter((F.col("quality") >= 0.5) & (F.col("pred_lang") == "en"))
    w = Window.partitionBy("norm_h").orderBy("doc_id")
    return (
        kept.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id", "quality", "pred_lang", "n_tokens")
        .orderBy("doc_id")
    )


@query("q_language_id", oracle=_LANGID_ORACLE, tags=("llm", "text"))
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import language_id

    return language_id(load(spark, sf_dir, "documents")).orderBy("doc_id")


# Token entropy: Shannon entropy of the per-document token distribution
# (low entropy = repetitive/template text — a quality signal). One
# explode + two keyed aggregations.

_ENTROPY_ORACLE = """
SELECT doc_id,
       ROUND(-SUM(p * LN(p)), 6) AS entropy,
       COUNT(*) AS n_distinct
FROM (
  SELECT doc_id,
         CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS p
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS tok
        FROM documents) t
  GROUP BY doc_id, tok
) dist
GROUP BY doc_id
ORDER BY doc_id
"""


@query("q_token_entropy", oracle=_ENTROPY_ORACLE, tags=("llm", "text"))
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    dist = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p", F.col("n").cast("double") / F.sum("n").over(Window.partitionBy("doc_id"))
        )
    )
    return (
        dist.groupBy("doc_id")
        .agg(
            F.round(-F.sum(F.col("p") * F.log(F.col("p"))), 6).alias("entropy"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .orderBy("doc_id")
    )


# Document fingerprint: min/max over a stride-4 rolling window of 8-char
# shingle hashes (winnowing-style). Scalar expression, no explode.

_FP_ORACLE = """
SELECT doc_id,
       LIST_MIN(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 7, 1) + 1, 4),
                               i -> MD5(SUBSTR(text, CAST(i AS INTEGER), 8)))) AS fp_min,
       LIST_MAX(LIST_TRANSFORM(RANGE(1, GREATEST(LENGTH(text) - 7, 1) + 1, 4),
                               i -> MD5(SUBSTR(text, CAST(i AS INTEGER), 8)))) AS fp_max
FROM documents
ORDER BY doc_id
"""


@query("q_doc_fingerprint", oracle=_FP_ORACLE, tags=("llm", "text"))
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import fingerprint

    return fingerprint(load(spark, sf_dir, "documents")).orderBy("doc_id")


# Product quantization ADC search: the third classic ANN scale path
# (IVF = prune candidates, SRP = hash-band candidates, PQ = compress the
# vectors). Codebooks are TRAINED (per-subspace Lloyd, deterministic
# first-k init, same fit as the IVF/k-means gates); encoding and ADC
# scoring are then pure functions of the codebooks, so the oracle
# re-derives the whole thing — eight k-means chains, one per subspace —
# and the gate is a full hash check, nothing approximate about the
# comparison. The query runs the production two-stage shape: ADC scan
# over the compressed codes to a shortlist, then EXACT inner-product
# rerank of shortlist rows only (measured recall@5 vs exact IP = 0.92
# at this corpus/config; asserted in tests/test_similarity_kernels.py).

_PQ_M = 8
_PQ_SUB = 8
_PQ_K = 16
_PQ_ITERS = 2
_PQ_NQ = 10
_PQ_SHORTLIST = 100


def _pq_subspace_ctes(
    s: int, k: int, iters: int, nq: int, train_pred: str | None = None
) -> str:
    """One subspace's CTE chain. ``train_pred`` (a boolean SQL expr on
    vec_id) restricts TRAINING — init vectors and Lloyd updates — to a
    base subset, while code assignment still covers every vector: the
    incremental-index semantics (append-encode with stored codebooks).
    None keeps the original full-corpus chain byte-for-byte."""
    lo, hi = s * _PQ_SUB, (s + 1) * _PQ_SUB
    p = f"s{s}"
    if train_pred is None:
        init = f"vec_id < {k}"
        tr = f"{p}ev"
        parts = [
            f"""
{p}ev AS (SELECT vec_id, dim - {lo} AS dim, val FROM ev WHERE dim > {lo} AND dim <= {hi}),
{p}c0 AS (SELECT vec_id AS cid, dim, val FROM {p}ev WHERE {init})"""
        ]
    else:
        # first k BASE ids init the codebooks (pq_fit: orderBy(id).limit(k))
        tr = f"{p}tr"
        parts = [
            f"""
{p}ev AS (SELECT vec_id, dim - {lo} AS dim, val FROM ev WHERE dim > {lo} AND dim <= {hi}),
{p}tr AS (SELECT * FROM {p}ev WHERE {train_pred}),
{p}c0 AS (
  SELECT vec_id AS cid, dim, val FROM {p}tr
  WHERE vec_id IN (
    SELECT vec_id FROM (
      SELECT DISTINCT vec_id FROM ev WHERE {train_pred}
      ORDER BY vec_id LIMIT {k}) ini)
)"""
        ]
    prev = f"{p}c0"
    for i in range(1, iters + 1):
        parts.append(
            f"""
{p}d{i} AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM {tr} e JOIN {prev} c ON e.dim = c.dim GROUP BY e.vec_id, c.cid
),
{p}a{i} AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM {p}d{i}) t WHERE rk = 1
),
{p}u{i} AS (
  SELECT a.cid, e.dim, AVG(e.val) AS c
  FROM {p}a{i} a JOIN {tr} e ON a.vec_id = e.vec_id GROUP BY a.cid, e.dim
),
{p}c{i} AS (
  SELECT p.cid, p.dim, COALESCE(u.c, p.val) AS val
  FROM {prev} p LEFT JOIN {p}u{i} u ON u.cid = p.cid AND u.dim = p.dim
)"""
        )
        prev = f"{p}c{i}"
    parts.append(
        f"""
{p}dd AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS dist
  FROM {p}ev e JOIN {prev} c ON e.dim = c.dim GROUP BY e.vec_id, c.cid
),
{p}code AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
    FROM {p}dd) t WHERE rk = 1
),
{p}lut AS (
  -- order-guaranteed sequential sum (LIST ORDER BY dim -> LIST_SUM)
  -- to mirror the driver's in-order float accumulation; a GROUP BY
  -- SUM() here would have engine-chosen accumulation order.
  SELECT query_id, cid, LIST_SUM(prods) AS dot FROM (
    SELECT q.vec_id AS query_id, c.cid,
           LIST(q.val * c.val ORDER BY q.dim) AS prods
    FROM {p}ev q JOIN {prev} c ON q.dim = c.dim
    WHERE q.vec_id < {nq} GROUP BY q.vec_id, c.cid
  ) t
),
{p}score AS (
  SELECT l.query_id, a.vec_id, l.dot FROM {p}lut l JOIN {p}code a ON a.cid = l.cid
)"""
    )
    return ",".join(parts)


def _pq_oracle(
    k: int = _PQ_K,
    iters: int = _PQ_ITERS,
    nq: int = _PQ_NQ,
    short: int = _PQ_SHORTLIST,
    train_pred: str | None = None,
    store_pred: str = "TRUE",
) -> str:
    chains = ",".join(
        _pq_subspace_ctes(s, k, iters, nq, train_pred) for s in range(_PQ_M)
    )
    adc = " + ".join(f"s{s}.dot" for s in range(_PQ_M))
    joins = "\n  ".join(
        f"JOIN s{s}score s{s} ON s{s}.query_id = s0.query_id AND s{s}.vec_id = s0.vec_id"
        for s in range(1, _PQ_M)
    )
    ip = (
        "LIST_SUM(LIST_TRANSFORM(LIST_ZIP(q.embedding, v.embedding), "
        "pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE)))"
    )
    return f"""
WITH ev AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
),{chains},
shortlist AS (
  SELECT query_id, vec_id FROM (
    SELECT s0.query_id, s0.vec_id,
           ROW_NUMBER() OVER (PARTITION BY s0.query_id
                              ORDER BY {adc} DESC, s0.vec_id) AS adc_rk
    FROM s0score s0
  {joins}
    WHERE s0.vec_id <> s0.query_id AND ({store_pred})
  ) t WHERE adc_rk <= {short}
),
rer AS (
  SELECT s.query_id, s.vec_id, {ip} AS ip
  FROM shortlist s
  JOIN embeddings q ON q.vec_id = s.query_id
  JOIN embeddings v ON v.vec_id = s.vec_id
)
SELECT query_id, vec_id, score, rk FROM (
  SELECT query_id, vec_id, ROUND(ip, 6) AS score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, vec_id) AS rk
  FROM rer
) t WHERE rk <= 5
ORDER BY query_id, rk"""


def _pq_queries(e: DataFrame) -> list[tuple[int, list[float]]]:
    qrows = (
        e.filter(F.col("vec_id") < _PQ_NQ)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return [(r["vec_id"], list(r["embedding"])) for r in qrows]


def _adc_rerank(spark, enc, cbs, queries, e) -> DataFrame:
    """ADC shortlist + exact rerank — the production two-stage shape,
    shared by the in-session and persisted-index gates. The shortlist
    is nq * shortlist rows — broadcast it against the embeddings table
    twice (query + candidate side); all exact math happens on shortlist
    rows only, never the corpus."""
    from rspl_spark.operators.similarity import pq_adc_topk

    short = pq_adc_topk(enc, cbs, queries, topk=_PQ_SHORTLIST).drop("adc", "rk")
    qdf = spark.createDataFrame(
        [(q, v) for q, v in queries], "query_id long, q_emb array<double>"
    )
    rer = (
        F.broadcast(short)
        .join(F.broadcast(qdf), "query_id")
        .join(
            e.select(
                F.col("vec_id"),
                F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v_emb"),
            ),
            "vec_id",
        )
        .withColumn("ip", _dot(F.col("q_emb"), F.col("v_emb")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ip"), F.asc("vec_id"))
    return (
        rer.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", F.round("ip", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
    )


@query("q_ann_pq_adc", oracle=_pq_oracle(), tags=("llm", "similarity", "iterative"))
def q_ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import pq_encode, pq_fit

    e = load(spark, sf_dir, "embeddings")
    cbs = pq_fit(e, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS)
    enc = _memo_artifact(
        spark, ("pq_codes", sf_dir), lambda: pq_encode(e, cbs).repartition(32)
    )
    return _adc_rerank(spark, enc, cbs, _pq_queries(e), e)


# Persisted-index variant: the index lives as a managed table (code
# rows) + TBLPROPERTIES (codebooks). The gate replays the two-batch
# pipeline — fit on the BASE slice only, CTAS, then append-encode the
# increment with the STORED codebooks — and queries the appended index.
# The oracle trains its eight k-means chains on the base slice
# (train_pred) but assigns codes to every vector: exactly the
# append-without-refit semantics. Rebuilt from scratch each run (drop +
# create + append) so the gate is deterministic however often it runs;
# cross-session reuse and the staleness/refresh hooks are exercised in
# tests/test_ann_store.py.

_PQ_INCR_PRED = "vec_id % 3 <> 0"


@query(
    "q_ann_pq_adc_incremental",
    oracle=_pq_oracle(train_pred=_PQ_INCR_PRED),
    tags=("llm", "similarity", "iterative", "scale"),
)
def q_ann_pq_adc_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.ann_store import (
        append_pq_index,
        create_pq_index,
        pq_index_codebooks,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"pqindex_{slug}"

    def build():
        create_pq_index(
            spark,
            e.filter(F.expr(_PQ_INCR_PRED)),
            name,
            m=_PQ_M,
            k=_PQ_K,
            iters=_PQ_ITERS,
            overwrite=True,
            tag="base",
        )
        append_pq_index(
            spark,
            e.filter(~F.expr(_PQ_INCR_PRED)),
            name,
            tag="base+inc",
        )
        return spark.table(name).localCheckpoint()

    enc = _memo_artifact(spark, ("pq_index", sf_dir), build)
    cbs = pq_index_codebooks(spark, name)
    return _adc_rerank(spark, enc, cbs, _pq_queries(e), e)


@query(
    "q_ann_pq_delete",
    oracle=_pq_oracle(store_pred="s0.vec_id % 5 <> 0"),
    tags=("llm", "similarity", "iterative", "scale", "delete"),
)
def q_ann_pq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the persisted PQ index one-shot on the full corpus,
    tombstone the takedown slice (vec_id % 5 = 0), probe through the
    live view — must hash-match the oracle's ADC chain restricted to
    surviving vectors (codebooks unchanged: delete never refits)."""
    from rspl_spark.operators.ann_store import (
        _live_rows,
        create_pq_index,
        delete_keys,
        pq_index_codebooks,
    )

    e = load(spark, sf_dir, "embeddings")
    slug = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    name = f"pqindex_{slug}_del"

    def build():
        create_pq_index(
            spark, e, name, m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS,
            overwrite=True, tag="full",
        )
        delete_keys(spark, name, e.filter(F.expr(_ANN_DEL_PRED)).select("vec_id"))
        return _live_rows(spark, name).localCheckpoint()

    enc = _memo_artifact(spark, ("pq_index_del", sf_dir), build)
    cbs = pq_index_codebooks(spark, name)
    return _adc_rerank(spark, enc, cbs, _pq_queries(e), e)


# Count-min heavy hitters: bounded-memory frequency estimation. The
# exact token top-k (q_top_bigrams) shuffles the whole vocabulary; the
# sketch bounds distributed state at d*w integer cells (mergeable by
# cell-wise addition — Spark's partial agg IS the merge), the classic
# answer when the key space is billions of long-tail tokens. Integer
# counts + portable md5 hashing make the gate an exact replay: DuckDB
# rebuilds the same cells and the same minima, no tolerance needed.

_CMS_W = 64
_CMS_D = 3

# hrows carries the integer divisor 2^(20*i) so the bucket derivation
# stays integer division (h // 2^(20*i)) % 2^20 % w — the one-md5
# field split of operators/sketches._buckets, replayed exactly.
_CMS_ORACLE = f"""
WITH tok AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM tok WHERE token <> '' GROUP BY token
),
hrows AS (
  SELECT UNNEST(RANGE(0, {_CMS_D})) AS i,
         UNNEST([{", ".join(str(1 << (20 * i)) + "::BIGINT" for i in range(_CMS_D))}]) AS dv
),
cells AS (
  SELECT h.i,
         ((CAST('0x' || SUBSTR(MD5(t.token), 1, 15) AS BIGINT) // h.dv)
          % {1 << 20}) % {_CMS_W} AS bucket,
         CAST(SUM(t.true_cnt) AS BIGINT) AS c
  FROM tf t CROSS JOIN hrows h
  GROUP BY 1, 2
),
est AS (
  SELECT t.token, MIN(t.true_cnt) AS true_cnt, CAST(MIN(c.c) AS BIGINT) AS est
  FROM tf t
  CROSS JOIN hrows h
  JOIN cells c
    ON c.i = h.i
   AND c.bucket = ((CAST('0x' || SUBSTR(MD5(t.token), 1, 15) AS BIGINT) // h.dv)
                   % {1 << 20}) % {_CMS_W}
  GROUP BY t.token
)
SELECT token, est, true_cnt FROM est
ORDER BY est DESC, token LIMIT 10
"""


_TOPK_EXACT_ORACLE = """
WITH tok AS (
  SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM tok WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token LIMIT 20
"""


@query(
    "q_cms_topk_exact", oracle=_TOPK_EXACT_ORACLE, tags=("llm", "text", "sketch")
)
def q_cms_topk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS-prefiltered EXACT top-k heavy hitters, promoted from
    test-only to a full oracle gate: the oracle is the NAIVE exact
    aggregate (GROUP BY every token, ORDER BY count) precisely because
    the operator's claim is bit-exactness while never shuffling the
    full vocabulary — one wide-sketch pass seeds a provably-lossless
    count threshold, so the exact-count exchange only ever carries
    plausible heavy hitters (operators/sketches.py:702). Tie-break
    (n desc, token asc) is pinned by both sides."""
    from rspl_spark.operators.sketches import cms_topk_exact

    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    return cms_topk_exact(tok, "token", k=20)


@query("q_heavy_hitters_cms", oracle=_CMS_ORACLE, tags=("llm", "text", "sketch"))
def q_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.sketches import cms_estimate, cms_sketch

    d = load(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token")).filter(
        F.col("token") != ""
    )
    sketch = cms_sketch(tok, "token", w=_CMS_W, d=_CMS_D)
    truth = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
    est = cms_estimate(sketch, truth.select("token"), "token", w=_CMS_W, d=_CMS_D)
    return (
        est.join(truth, "token")
        .select("token", "est", "true_cnt")
        .orderBy(F.desc("est"), F.asc("token"))
        .limit(10)
    )


# HyperLogLog approx-distinct (Flajolet et al. 2007): the production
# answer is approx_count_distinct, but its HLL++ register hash is
# engine-private, so this gate runs the repo's portable-hash HLL
# (operators/sketches.py) whose ESTIMATE both engines compute
# bit-for-bit — the harmonic-mean denominator is an exact integer sum
# of powers of two, order-insensitive by construction. The gate reports
# estimate, exact count, and relative error per group; the cardinality
# (~2k-20k distinct per flag across SFs) sits far above the 2.5m
# linear-counting branch, so no ln() crosses engines.


def _hll_oracle() -> str:
    from rspl_spark.operators.sketches import hll_sql

    return f"""
WITH {hll_sql("lineitem", "l_extendedprice", ("l_returnflag",))},
hexact AS (
  SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS exact_distinct
  FROM lineitem GROUP BY l_returnflag
)
SELECT e.l_returnflag, h.approx_distinct, e.exact_distinct,
       ROUND(ABS(h.approx_distinct - e.exact_distinct)
             / CAST(e.exact_distinct AS DOUBLE), 4) AS rel_err
FROM hest h JOIN hexact e USING (l_returnflag)
ORDER BY e.l_returnflag
"""


@query(
    "q_approx_distinct_hll",
    oracle=_hll_oracle(),
    tags=("llm", "sketch", "aggregation"),
)
def q_approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.sketches import hll_estimate, hll_registers

    li = load(spark, sf_dir, "lineitem")
    regs = hll_registers(li, "l_extendedprice", ("l_returnflag",))
    est = hll_estimate(regs, ("l_returnflag",))
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_extendedprice").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "l_returnflag")
        .select(
            "l_returnflag",
            "approx_distinct",
            "exact_distinct",
            F.round(
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct").cast("double"),
                4,
            ).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


# Time-bucketed HLL: distinct users per day — the dashboard cardinality
# primitive (registers keyed by (day, idx), so a year of days costs
# 365*m register rows, not 365 * |users|). m=32 here: daily cardinality
# is small, and the COARSER sketch deliberately exercises BOTH estimate
# branches across SFs (sf0.001 days fall into linear counting, sf0.01
# days use the raw formula — branch choice itself is deterministic
# because E compares identically on both engines; the linear branch's
# ln() carries the documented <=1-ulp libm risk that round(2) absorbs,
# same class as every round(6) float gate).

_HLL_DAY_P = 5


def _hll_day_oracle() -> str:
    from rspl_spark.operators.sketches import hll_sql

    ctes = hll_sql(
        "(SELECT CAST(ts AS DATE) AS day, user_id FROM events) ev",
        "user_id",
        ("day",),
        p=_HLL_DAY_P,
    )
    return f"""
WITH {ctes},
dexact AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
)
SELECT e.day, h.approx_distinct, e.exact_distinct
FROM hest h JOIN dexact e USING (day)
ORDER BY e.day
"""


@query(
    "q_hll_daily_users",
    oracle=_hll_day_oracle(),
    tags=("llm", "sketch", "aggregation", "time"),
)
def q_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.sketches import hll_estimate, hll_registers

    ev = load(spark, sf_dir, "events")
    d = ev.select(F.to_date("ts").alias("day"), "user_id")
    est = hll_estimate(hll_registers(d, "user_id", ("day",), p=_HLL_DAY_P), ("day",), p=_HLL_DAY_P)
    exact = d.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "day")
        .select("day", "approx_distinct", "exact_distinct")
        .orderBy("day")
    )


# Histogram quantiles: the replayable approximate-percentile path
# (approx_percentile's t-digest is engine-private, the HLL++ story
# again). Integer bin counts merge by addition — partial agg IS the
# merge, shuffle <= nbins rows/partition/group — and the interpolation
# applies identical operations in identical order on both engines, so
# the gate hash-checks the ESTIMATES. Completes the bounded-state
# sketch trio: CMS (frequency), HLL (cardinality), histogram
# (quantiles).


def _hist_q_oracle() -> str:
    from rspl_spark.operators.sketches import hist_quantiles_sql

    ctes = hist_quantiles_sql(
        "lineitem", "l_extendedprice", (0.5, 0.95, 0.99), ("l_returnflag",)
    )
    return f"""
WITH {ctes}
SELECT l_returnflag, q, est FROM hq ORDER BY l_returnflag, q
"""


@query(
    "q_approx_percentile_hist",
    oracle=_hist_q_oracle(),
    tags=("llm", "sketch", "aggregation"),
)
def q_approx_percentile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.sketches import hist_quantiles

    li = load(spark, sf_dir, "lineitem")
    return hist_quantiles(
        li, "l_extendedprice", (0.5, 0.95, 0.99), ("l_returnflag",)
    ).orderBy("l_returnflag", "q")


# Semantic dedup: the embedding-space sibling of MinHash dedup as ONE
# decision table. Trained-cell blocked cosine pairs >= 0.4 (the
# q_embedding_cosine_pairs machinery) feed O(log n) connected
# components; each vector keeps iff it is its cluster's minimum id.
# The oracle replays training, blocking, thresholding, AND reachability
# (recursive CTE) — the full pipeline is hash-checked, including the
# "untouched vectors keep themselves" left-join semantics.


def _semantic_dedup_oracle(
    k: int = 8,
    iters: int = _IVF_TRAINED_ITERS,
    k_sql: str | None = None,
    train_pred: str | None = None,
) -> str:
    cos = _SQL_COS.format(a="ea.embedding", b="eb.embedding")
    chains = _kmeans_ctes(k, iters, k_sql=k_sql, train_pred=train_pred).replace(
        "WITH ev AS", "WITH RECURSIVE ev AS", 1
    )
    return (
        chains
        + f""",
sd_dist AS (
  SELECT e.vec_id, c.cid, SUM((e.val - c.val) * (e.val - c.val)) AS d2
  FROM ev e JOIN c{iters} c ON e.dim = c.dim
  GROUP BY e.vec_id, c.cid
),
sd_assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rk
    FROM sd_dist
  ) t WHERE rk = 1
),
sd_pairs AS (
  SELECT vec_a, vec_b FROM (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ROUND({cos}, 6) AS score
    FROM sd_assign a
    JOIN sd_assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
  ) t WHERE score >= {_EMB_PAIR_THRESHOLD}
),
sd_und AS (
  SELECT vec_a AS a, vec_b AS b FROM sd_pairs
  UNION SELECT vec_b, vec_a FROM sd_pairs
),
sd_reach AS (
  SELECT a AS src, a AS dst FROM sd_und
  UNION SELECT a, b FROM sd_und
  UNION SELECT r.src, u.b FROM sd_reach r JOIN sd_und u ON r.dst = u.a
),
sd_comp AS (
  SELECT src AS vec_id, MIN(dst) AS cluster FROM sd_reach GROUP BY src
)
SELECT e.vec_id,
       COALESCE(c.cluster, e.vec_id) AS cluster,
       CAST(CASE WHEN COALESCE(c.cluster, e.vec_id) = e.vec_id
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM embeddings e LEFT JOIN sd_comp c ON c.vec_id = e.vec_id
ORDER BY e.vec_id"""
    )


@query(
    "q_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    tags=("llm", "dedup", "similarity", "iterative"),
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import semantic_dedup

    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, threshold=_EMB_PAIR_THRESHOLD, k=8, iters=_IVF_TRAINED_ITERS
    ).orderBy("vec_id")


# The SCALE-PATH default, hash-gated: k derived from the corpus size
# (semantic_dedup's k=None branch — max(8, min(max_k, n // target_cell)))
# instead of the fixed k=8 the gate above binds for oracle determinism.
# target_cell=32 makes adaptive k = 15 at sf0.01, so the gate actually
# exercises a DIFFERENT cell count than the fixed-k gate; the oracle
# derives the same k with a scalar subquery (r6 judge ask #4 — the
# adaptive default was parity-tested but never oracle-gated).
# max_k=64 bounds the GATE's fit when run at big sf — target_cell=32
# would otherwise push k to the 4096 cap at 500k vectors, and the
# O(n*k*d) Lloyd fit (131 GFLOP/pass) timed out the r7 sf10 sweep;
# the OPERATOR default (target_cell=512) measured 22.7s there in r6.

_SD_ADAPTIVE_TARGET_CELL = 32
_SD_ADAPTIVE_MAX_K = 64
# The oracle below does NOT replay kmeans_fit's fewer-than-k-rows
# full-fit fallback; that is sound only while the expected sample
# (max_k * target_cell rows) sits far above max_k, so the md5 draw
# cannot plausibly starve the sample below k. Keep >= 8x headroom when
# retuning — violating this silently enters the un-replayed fallback
# regime and the gate would hash-diverge at exactly one scale
# (ADVICE r14).
assert _SD_ADAPTIVE_MAX_K * _SD_ADAPTIVE_TARGET_CELL >= 8 * _SD_ADAPTIVE_MAX_K, (
    "adaptive semantic-dedup gate: expected fit sample "
    "(max_k*target_cell) must keep >=8x headroom over max_k, or the "
    "oracle's un-replayed fewer-than-k-rows fallback becomes reachable"
)
_SD_ADAPTIVE_K_SQL = (
    f"SELECT GREATEST(8, LEAST({_SD_ADAPTIVE_MAX_K}, COUNT(*) // {_SD_ADAPTIVE_TARGET_CELL})) "
    "FROM embeddings"
)

# Past the adaptive-k cap (n // target_cell > max_k, i.e. n > 2048 rows
# for this gate's parameters) semantic_dedup fits the centroids on a
# DETERMINISTIC md5-hash sample of max_k*target_cell expected rows
# (kmeans_fit's sample_frac path) — the r14 sf1 sweep caught the oracle
# silently fitting on ALL rows instead (sf0.01 has exactly 2000
# embeddings, just under the trigger, so no smaller scale ever
# exercised it). The predicate below replays the sample exactly:
# cutoff arithmetic is the same IEEE double division/multiply/truncate
# sequence as Python's int((max_k*target_cell/n)*1e6), and the draw is
# the documented portable-md5 idiom ≡ Spark's
# conv(substring(md5(...),1,15),16,10) % 1e6. kmeans_fit's
# fewer-than-k-rows fallback is not replayed: when the trigger fires
# the expected sample is max_k*target_cell = 32*k rows, so a sub-k
# sample would need the md5 draw to starve a 2048-expectation down
# below 64 — not a reachable regime.
_SD_ADAPTIVE_TRAIN_PRED = (
    f"((SELECT COUNT(*) // {_SD_ADAPTIVE_TARGET_CELL} FROM embeddings)"
    f" <= {_SD_ADAPTIVE_MAX_K}"
    " OR CAST('0x' || SUBSTR(MD5('kmfit:' || CAST(vec_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 1000000"
    " < (SELECT CAST(FLOOR((CAST("
    f"{_SD_ADAPTIVE_MAX_K * _SD_ADAPTIVE_TARGET_CELL}"
    " AS DOUBLE) / COUNT(*)) * 1000000.0) AS BIGINT) FROM embeddings))"
)


@query(
    "q_semantic_dedup_adaptive",
    oracle=_semantic_dedup_oracle(
        k_sql=_SD_ADAPTIVE_K_SQL, train_pred=_SD_ADAPTIVE_TRAIN_PRED
    ),
    tags=("llm", "dedup", "similarity", "iterative", "scale"),
)
def q_semantic_dedup_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import semantic_dedup

    e = load(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e,
        threshold=_EMB_PAIR_THRESHOLD,
        iters=_IVF_TRAINED_ITERS,
        target_cell=_SD_ADAPTIVE_TARGET_CELL,
        max_k=_SD_ADAPTIVE_MAX_K,
    ).orderBy("vec_id")


# Bigram-LM perplexity filter (CCNet pattern): train an add-one-smoothed
# bigram model on the English slice, score EVERY document by average
# bigram negative log-probability. The model is two count tables keyed
# on the n-grams themselves — data-sized, never collected; scoring is
# two bigram-keyed joins. Exact SQL replay: counts are integers, the
# only floats are the final -ln terms (averaged, rounded).

_LM_ORACLE = r"""
WITH tok AS (
  SELECT doc_id, lang, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, lang, UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(t), 1)),
                                             i -> {'a': t[i], 'b': t[i + 1]})) AS p
  FROM tok
),
train AS (SELECT p.a AS a, p.b AS b FROM bg WHERE lang = 'en'),
c2 AS (SELECT a, b, COUNT(*) AS n2 FROM train GROUP BY a, b),
c1 AS (SELECT a, COUNT(*) AS n1 FROM train GROUP BY a),
v AS (
  SELECT COUNT(DISTINCT tk) AS vs
  FROM (SELECT UNNEST(t) AS tk FROM tok WHERE lang = 'en')
),
terms AS (
  SELECT g.doc_id,
         -LN((COALESCE(c2.n2, 0) + 1.0) / (COALESCE(c1.n1, 0) + v.vs)) AS nll
  FROM bg g
  LEFT JOIN c2 ON c2.a = g.p.a AND c2.b = g.p.b
  LEFT JOIN c1 ON c1.a = g.p.a
  CROSS JOIN v
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, AVG(nll) AS avg_nll
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       ROUND(p.avg_nll, 6) AS avg_nll
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


@query("q_bigram_lm_perplexity", oracle=_LM_ORACLE, tags=("llm", "text", "curation"))
def q_bigram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import bigram_lm_score

    d = load(spark, sf_dir, "documents")
    out = bigram_lm_score(d, F.col("lang") == "en")
    return out.select(
        "doc_id", "n_bigrams", F.round("avg_nll", 6).alias("avg_nll")
    ).orderBy("doc_id")


# Johnson-Lindenstrauss random projection: deterministic ±1 directions
# (same integer-hash family as the SRP planes), scaled 1/sqrt(out_dim).
# The cheap first stage when raw dimensionality is the cost driver —
# a narrow, pure-codegen projection. Long-format output (one row per
# component) keeps the float comparison under the 6-decimal rounding.

_RP_OUT = 16


def _rp_oracle() -> str:
    from rspl_spark.operators.similarity import rp_signs

    scale = 1.0 / float(_RP_OUT) ** 0.5
    comps = []
    for j in range(_RP_OUT):
        signs = "[" + ", ".join(str(float(s)) for s in rp_signs(j, _SRP_DIM)) + "]"
        dot = (
            f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP(embedding, {signs}), "
            f"pr -> CAST(pr[1] AS DOUBLE) * pr[2]))"
        )
        comps.append(f"SELECT vec_id, {j} AS j, ROUND({dot} * {scale!r}, 6) AS val FROM embeddings")
    return " UNION ALL ".join(comps) + " ORDER BY vec_id, j"


@query("q_random_projection", oracle=_rp_oracle(), tags=("llm", "similarity"))
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import random_projection

    e = load(spark, sf_dir, "embeddings")
    proj = random_projection(e, _RP_OUT, _SRP_DIM)
    return (
        proj.select("vec_id", F.posexplode("projected").alias("j", "raw"))
        .select("vec_id", "j", F.round("raw", 6).alias("val"))
        .orderBy("vec_id", "j")
    )


# Two-sample KS drift statistic: src0-vs-src1 document-length
# distributions. Integer counts until the final divisions make the
# oracle replay exact; the cumulative window runs over DISTINCT values
# (V rows, not n), the scale story for a drift monitor.

_KS_ORACLE = """
WITH pooled AS (
  SELECT CAST(n_chars AS DOUBLE) AS v,
         CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS a,
         CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS b
  FROM documents WHERE source IN ('src0', 'src1')
),
pv AS (SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM pooled GROUP BY v),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b
  FROM pv
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b FROM pooled
)
SELECT ROUND(MAX(ABS(cum_a * 1.0 / n_a - cum_b * 1.0 / n_b)), 6) AS d_stat,
       n_a, n_b
FROM cum CROSS JOIN tot
GROUP BY n_a, n_b
"""


@query("q_ks_drift", oracle=_KS_ORACLE, tags=("llm", "curation", "drift"))
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.drift import ks_statistic

    d = load(spark, sf_dir, "documents")
    out = ks_statistic(
        d, "n_chars", F.col("source") == "src0", F.col("source") == "src1"
    )
    return out.select(F.round("d_stat", 6).alias("d_stat"), "n_a", "n_b")


# PCA top component by distributed covariance + power iteration: the
# covariance lands on the driver from ONE partial-sum pass (d + d^2
# floats per partition); three un-normalized power steps from the fixed
# all-ones/sqrt(d) start give a deterministic direction with no
# eigenvector sign ambiguity — which is exactly what lets the oracle
# replay the whole fit in SQL (an eigh-based PCA could not be gated).

_PCA_ITERS = 3


def _pca_oracle(iters: int = _PCA_ITERS) -> str:
    its = []
    prev = "it0"
    for i in range(1, iters + 1):
        its.append(
            f""",
it{i} AS (
  SELECT cv.i AS dim, SUM(cv.c * {prev}.val) AS val
  FROM cv JOIN {prev} ON {prev}.dim = cv.j GROUP BY cv.i
)"""
        )
        prev = f"it{i}"
    return f"""
WITH ev AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cnt AS (SELECT COUNT(*) AS n FROM embeddings),
mu AS (SELECT dim, AVG(val) AS m FROM ev GROUP BY dim),
cv AS (
  SELECT a.dim AS i, b.dim AS j,
         SUM((a.val - ma.m) * (b.val - mb.m)) / cnt.n AS c
  FROM ev a JOIN ev b ON a.vec_id = b.vec_id
  JOIN mu ma ON ma.dim = a.dim
  JOIN mu mb ON mb.dim = b.dim
  CROSS JOIN cnt
  GROUP BY a.dim, b.dim, cnt.n
),
it0 AS (SELECT dim, 0.125 AS val FROM mu){"".join(its)},
nrm AS (SELECT SQRT(SUM(val * val)) AS s FROM {prev}),
pr AS (
  SELECT e.vec_id, SUM((e.val - mu.m) * v.val) AS p
  FROM ev e JOIN mu ON mu.dim = e.dim JOIN {prev} v ON v.dim = e.dim
  GROUP BY e.vec_id
)
SELECT vec_id, ROUND(p / nrm.s, 6) AS proj
FROM pr CROSS JOIN nrm ORDER BY vec_id"""


@query("q_pca_power_projection", oracle=_pca_oracle(), tags=("llm", "similarity", "iterative"))
def q_pca_power_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.similarity import pca_power_fit, pca_project

    e = load(spark, sf_dir, "embeddings")
    mu, comp = pca_power_fit(e, iters=_PCA_ITERS)
    return (
        pca_project(e, mu, comp)
        .select("vec_id", F.round("proj", 6).alias("proj"))
        .orderBy("vec_id")
    )


# Corpus-wide line/passage dedup (operators/text.py::line_dedup — the
# RefinedWeb/CCNet boilerplate pass): lines repeated across >= min_docs
# DISTINCT documents are removed everywhere and the survivors
# reassembled in order. The synthetic corpus has no newlines, so the
# gate first re-chunks each document into 8-token "lines" with the
# SAME deterministic expression in both engines — the dedup then has
# real cross-document collisions to remove (the tiny synthetic
# vocabulary makes 8-token chunks repeat often).

_LD_CHUNK = 8

_LINE_DEDUP_ORACLE = f"""
WITH ld_base AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS ts FROM documents
),
ld_lines AS (
  SELECT doc_id,
         CAST(generate_subscripts(chunks, 1) AS BIGINT) AS pos,
         UNNEST(chunks) AS line
  FROM (
    SELECT doc_id,
           LIST_TRANSFORM(RANGE(0, CAST(CEIL(LEN(ts) / {float(_LD_CHUNK)!r}) AS BIGINT)),
                          i -> ARRAY_TO_STRING(LIST_SLICE(ts, i * {_LD_CHUNK} + 1,
                                                          i * {_LD_CHUNK} + {_LD_CHUNK}), ' ')) AS chunks
    FROM ld_base)
),
ld_boiler AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS nd FROM ld_lines GROUP BY line
  ) t WHERE nd >= 2
),
ld_kept AS (
  SELECT * FROM ld_lines WHERE line NOT IN (SELECT line FROM ld_boiler)
),
ld_tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_total FROM ld_lines GROUP BY doc_id),
ld_re AS (
  SELECT doc_id, STRING_AGG(line, CHR(10) ORDER BY pos) AS clean_text,
         CAST(COUNT(*) AS BIGINT) AS n_kept
  FROM ld_kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_kept,
       CAST(t.n_total - COALESCE(r.n_kept, 0) AS BIGINT) AS n_lines_removed
FROM ld_tot t LEFT JOIN ld_re r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
"""


@query("q_line_dedup", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "dedup", "text"))
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.text import line_dedup

    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_LD_CHUNK))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * _LD_CHUNK + 1, _LD_CHUNK)),
    )
    chunked = d.select("doc_id", F.concat_ws("\n", chunks).alias("text"))
    return line_dedup(chunked, sep="\n", min_docs=2).orderBy("doc_id")


# Bloom-filter membership (operators/sketches.py): the 4th mergeable
# sketch. Build on the customer name set, probe every supplier name
# (disjoint — members only via hash collision) plus a customer sample
# (guaranteed members): no false negatives is a THEOREM the gate
# hash-checks, and the false-positive bits replay exactly because the
# whole filter is integer ops on the portable hash.

_BLOOM_M = 1 << 14
_BLOOM_K = 3


def _bloom_oracle() -> str:
    from rspl_spark.operators.sketches import bloom_bit_sql

    build_pos = "\nUNION ALL\n".join(
        f"SELECT {bloom_bit_sql('c_name', i, _BLOOM_M)} AS pos FROM customer"
        for i in range(_BLOOM_K)
    )
    probe_pos = "\nUNION ALL\n".join(
        f"SELECT probe, {bloom_bit_sql('probe', i, _BLOOM_M)} AS pos FROM bl_probes"
        for i in range(_BLOOM_K)
    )
    return f"""
WITH bl_pos AS (
{build_pos}
),
bl_words AS (
  SELECT pos // 60 AS word,
         BIT_OR(1::BIGINT << CAST(pos % 60 AS INTEGER)) AS bits
  FROM bl_pos GROUP BY pos // 60
),
bl_probes AS (
  SELECT s_name AS probe FROM supplier
  UNION ALL
  SELECT c_name FROM customer WHERE c_custkey % 10 = 0
),
bl_pp AS (
{probe_pos}
)
SELECT pp.probe,
       CAST(MIN(CASE WHEN (COALESCE(w.bits, 0)
                           & (1::BIGINT << CAST(pp.pos % 60 AS INTEGER))) <> 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS member
FROM bl_pp pp LEFT JOIN bl_words w ON w.word = pp.pos // 60
GROUP BY pp.probe
ORDER BY pp.probe
"""


@query("q_bloom_membership", oracle=_bloom_oracle(), tags=("llm", "sketch"))
def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rspl_spark.operators.sketches import bloom_build, bloom_probe

    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    sketch = bloom_build(c.select(F.col("c_name")), "c_name", m_bits=_BLOOM_M, k=_BLOOM_K)
    probes = s.select(F.col("s_name").alias("probe")).unionAll(
        c.filter(F.col("c_custkey") % 10 == 0).select(F.col("c_name").alias("probe"))
    )
    return (
        bloom_probe(sketch, probes, "probe", m_bits=_BLOOM_M, k=_BLOOM_K)
        .orderBy("probe")
    )


# ---------------------------------------------------------------------------
# END-TO-END corpus -> training shards (the chain a real pipeline runs):
#   PII scrub -> line dedup -> quality + language filter -> MinHash-LSH
#   near-dup dedup (representative per cluster) -> benchmark
#   decontamination -> deterministic content-hash split -> per-(split,
#   source) token packing into fixed-budget shards.
# Every stage is the SAME formulation its standalone gate verifies
# (pii_scrub patterns, the 8-token line chunking, quality/lang
# expressions, the 8-slot MinHash + 4-band LSH + star-CC clustering,
# 3-shingle contamination, md5 split, running-sum packing) — the gate
# proves the stages COMPOSE: each one consumes the previous stage's
# TRANSFORMED text, so a wrong intermediate corrupts every downstream
# number. The oracle replays the entire chain as one CTE pipeline.
#
# Scale shape (audited in tests/test_plan_properties.py): the raw text
# payload is scanned ONCE into the fused scrub+chunk projection; the
# only corpus-sized exchanges are the ones a stage inherently needs
# (line-key agg + doc reassembly for line dedup, the band self-join for
# LSH, the (split, source) window for packing). Quality/language/split
# are pure projections; contamination and the cluster/tombstone-style
# filters join BROADCAST-sized sides; the post-filter corpus is
# materialized once (localCheckpoint) and fanned out to the dedup,
# contamination, and packing consumers instead of re-deriving the
# scrub+line-dedup chain three times.

_C2S_CONT_MIN = 5  # drop docs sharing >= this many distinct shingles w/ benchmark


def _corpus_to_shards_oracle() -> str:
    from rspl_spark.operators.curation import PII_PATTERNS

    scrub = "COALESCE(text, '')"
    for _name, pat, tok in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{tok}', 'g')"
    sh_expr, th_expr = _sql_hashed_shingles("text")
    mh = ", ".join(_sql_minhash(j) for j in range(8))
    est = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(8)
    )
    return f"""
WITH RECURSIVE c2s_scrub AS (
  SELECT doc_id, source, {scrub} AS t FROM documents
),
c2s_ldb AS (
  SELECT doc_id, source, STRING_SPLIT_REGEX(TRIM(t), '\\s+') AS ts FROM c2s_scrub
),
c2s_ldl AS (
  SELECT doc_id,
         CAST(generate_subscripts(chunks, 1) AS BIGINT) AS pos,
         UNNEST(chunks) AS line
  FROM (
    SELECT doc_id,
           LIST_TRANSFORM(RANGE(0, CAST(CEIL(LEN(ts) / {float(_LD_CHUNK)!r}) AS BIGINT)),
                          i -> ARRAY_TO_STRING(LIST_SLICE(ts, i * {_LD_CHUNK} + 1,
                                                          i * {_LD_CHUNK} + {_LD_CHUNK}), ' ')) AS chunks
    FROM c2s_ldb)
),
c2s_boil AS (
  SELECT line FROM (
    SELECT line, COUNT(DISTINCT doc_id) AS nd FROM c2s_ldl GROUP BY line
  ) x WHERE nd >= 2
),
c2s_ldkept AS (
  SELECT * FROM c2s_ldl WHERE line NOT IN (SELECT line FROM c2s_boil)
),
c2s_ldre AS (
  SELECT doc_id, STRING_AGG(line, CHR(10) ORDER BY pos) AS t
  FROM c2s_ldkept GROUP BY doc_id
),
c2s_t2 AS (
  SELECT b.doc_id, b.source, COALESCE(r.t, '') AS text
  FROM c2s_ldb b LEFT JOIN c2s_ldre r ON b.doc_id = r.doc_id
),
c2s_hits AS (
  SELECT doc_id, source, text,
         {_lang_hits_sql("en")} AS en_hits,
         {_lang_hits_sql("de")} AS de_hits,
         {_lang_hits_sql("fr")} AS fr_hits,
         {_lang_hits_sql("es")} AS es_hits
  FROM c2s_t2
),
c2s_filt AS (
  SELECT doc_id, source, text FROM c2s_hits
  WHERE {_QUALITY_SQL_EXPR} >= 0.5 AND {_LANG_CASE_SQL} = 'en'
),
c2s_shsrc AS (
  SELECT doc_id, {sh_expr} AS sh
  FROM (SELECT doc_id, {th_expr} AS th FROM c2s_filt) q
),
c2s_sig AS (SELECT doc_id, {mh} FROM c2s_shsrc t),
c2s_bands AS (
  SELECT doc_id, 0 AS band, mh0 AS h1, mh1 AS h2 FROM c2s_sig UNION ALL
  SELECT doc_id, 1 AS band, mh2 AS h1, mh3 AS h2 FROM c2s_sig UNION ALL
  SELECT doc_id, 2 AS band, mh4 AS h1, mh5 AS h2 FROM c2s_sig UNION ALL
  SELECT doc_id, 3 AS band, mh6 AS h1, mh7 AS h2 FROM c2s_sig
),
c2s_pairs AS (
  SELECT c.doc_a, c.doc_b FROM (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM c2s_bands a JOIN c2s_bands b
      ON a.band = b.band AND a.h1 = b.h1 AND a.h2 = b.h2 AND a.doc_id < b.doc_id
  ) c JOIN c2s_sig sa ON c.doc_a = sa.doc_id JOIN c2s_sig sb ON c.doc_b = sb.doc_id
  WHERE ({est}) / 8.0 >= 0.25
),
c2s_und AS (
  SELECT doc_a AS a, doc_b AS b FROM c2s_pairs
  UNION SELECT doc_b, doc_a FROM c2s_pairs
),
c2s_reach AS (
  SELECT a AS src, a AS dst FROM c2s_und
  UNION SELECT a, b FROM c2s_und
  UNION SELECT r.src, u.b FROM c2s_reach r JOIN c2s_und u ON r.dst = u.a
),
c2s_comp AS (SELECT src AS doc_id, MIN(dst) AS cluster FROM c2s_reach GROUP BY src),
c2s_ddk AS (
  SELECT f.* FROM c2s_filt f LEFT JOIN c2s_comp c ON f.doc_id = c.doc_id
  WHERE c.cluster IS NULL OR c.cluster = f.doc_id
),
c2s_bsh AS (
  SELECT DISTINCT UNNEST(sh) AS s FROM (
    SELECT doc_id, {sh_expr} AS sh
    FROM (SELECT doc_id, {th_expr} AS th
          FROM documents WHERE doc_id < 10) bq
  ) bt
),
c2s_cont AS (
  SELECT c.doc_id
  FROM (SELECT doc_id, UNNEST(sh) AS s
        FROM c2s_shsrc WHERE doc_id IN (SELECT doc_id FROM c2s_ddk)) c
  JOIN c2s_bsh ON c.s = c2s_bsh.s
  GROUP BY c.doc_id HAVING COUNT(DISTINCT c.s) >= {_C2S_CONT_MIN}
),
c2s_clean AS (
  SELECT * FROM c2s_ddk
  WHERE doc_id >= 10 AND doc_id NOT IN (SELECT doc_id FROM c2s_cont)
),
c2s_staged AS (
  SELECT doc_id, source,
         CASE WHEN {_sql_hash("text")} % 100 < 90 THEN 'train'
              WHEN {_sql_hash("text")} % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
         LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS nt
  FROM c2s_clean
),
c2s_packed AS (
  SELECT split, source, nt,
         CAST((SUM(nt) OVER (PARTITION BY split, source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - nt)
              // {_PACK_BUDGET} AS BIGINT) AS bin
  FROM c2s_staged
)
SELECT split, source, bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS bin_tokens
FROM c2s_packed GROUP BY split, source, bin
ORDER BY split, source, bin"""


def _c2s_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1+2 fused into the scan projection: PII scrub, then
    re-chunk into 8-token "lines" (the synthetic corpus has no
    newlines). ONE documents scan — asserted by the plan audit."""
    from rspl_spark.operators.curation import PII_PATTERNS

    d = load(spark, sf_dir, "documents")
    cur = F.coalesce(F.col("text"), F.lit(""))
    for _name, pat, _tok in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, _tok)
    toks = F.split(F.trim(cur), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_LD_CHUNK))).cast("int")
    chunked = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * _LD_CHUNK + 1, _LD_CHUNK)),
        ),
    )
    return d.select("doc_id", "source", chunked.alias("text"))


def _c2s_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stages 1-3 of the corpus->shards chain. The scrub+chunk
    projection is MATERIALIZED before line dedup: line_dedup fans its
    input out four ways (line counts, boilerplate set, reassembly,
    per-doc totals) plus the source join-back, and without the barrier
    each consumer would re-run the regex chain against a fresh parquet
    scan — 4x the dominant per-byte cost (caught by the plan audit in
    tests/test_plan_properties.py; at 100 TB one scan + one
    spill-backed materialization beats four regex passes)."""
    from rspl_spark.operators.text import lang_pred_expr, line_dedup, quality_expr

    base = _c2s_base(spark, sf_dir).localCheckpoint(eager=False)
    ld = line_dedup(base, min_docs=2)
    t2 = ld.select("doc_id", F.col("clean_text").alias("text")).join(
        base.select("doc_id", "source"), "doc_id"
    )
    # stage 3: quality + language filter (fused column expressions)
    return t2.filter((quality_expr() >= 0.5) & (lang_pred_expr() == F.lit("en")))


@query(
    "q_corpus_to_shards",
    oracle=_corpus_to_shards_oracle(),
    tags=("llm", "text", "dedup", "scale"),
)
def q_corpus_to_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    kept = _c2s_kept(spark, sf_dir).localCheckpoint(eager=False)
    # stage 4: MinHash-LSH near-dup dedup, keep the cluster representative.
    # The signature table is MATERIALIZED before the band self-join (the
    # same one-pass artifact every other LSH gate builds): feeding the
    # raw minhash fold expression into the self-join duplicates the
    # aggregate-lambda subtree across both sides and Catalyst's
    # optimization of that doubled tree dominates the whole query
    # (measured r15: 81.7s -> 0.96s for the pairs step at sf0.1, the
    # full gate 119.5s -> ~13s; plans/r15/q_corpus_to_shards_*.txt).
    sig = D.minhash_signatures(kept).localCheckpoint(eager=False)
    cc = D.connected_components_star(D.lsh_candidate_pairs(sig, threshold=0.25))
    survivors = (
        kept.join(cc.withColumnRenamed("doc_id", "doc_id"), "doc_id", "left")
        .filter(F.col("cluster").isNull() | (F.col("cluster") == F.col("doc_id")))
        .drop("cluster")
    )
    # stage 5: decontamination against the RAW benchmark slice (doc_id < 10)
    bench = (
        D.with_hashed_shingles(d.filter(F.col("doc_id") < 10))
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    contaminated = (
        D.with_hashed_shingles(survivors)
        .select("doc_id", F.explode("sh").alias("s"))
        .join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        # count(*) == countDistinct here: sh is array_distinct'd per
        # doc and bench is distinct (dedup.py:237 rule — skips the
        # partial-distinct expand).
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= _C2S_CONT_MIN)
        .select("doc_id")
    )
    clean = survivors.filter(F.col("doc_id") >= 10).join(
        F.broadcast(contaminated), "doc_id", "left_anti"
    )
    # stage 6: deterministic content-hash split; stage 7: token packing
    bucket = portable_hash(F.col("text")) % 100
    split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    nt = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    staged = clean.select(
        "doc_id", "source", split.alias("split"), nt.alias("nt")
    )
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = staged.withColumn(
        "bin", ((F.sum("nt").over(w) - F.col("nt")) / _PACK_BUDGET).cast("long")
    )
    return (
        binned.groupBy("split", "source", "bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("bin_tokens"),
        )
        .orderBy("split", "source", "bin")
    )
