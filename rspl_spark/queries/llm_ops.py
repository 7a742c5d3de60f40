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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.catalog import load
from rspl_spark.queries import query

# ---------------------------------------------------------------------------
# Portable hash helpers (Spark side). DuckDB side inlined in oracle SQL:
#   CAST('0x' || SUBSTR(MD5(s), 1, 15) AS BIGINT)
# ---------------------------------------------------------------------------

MERSENNE_P = 2147483647  # 2^31 - 1

# (a, b) pairs for the k=8 minhash permutations — fixed seeds, public
# small primes; same constants inlined in oracle SQL.
MINHASH_COEFS = [
    (1000000007, 12345),
    (998244353, 54321),
    (769230769, 98765),
    (611949517, 13579),
    (500000003, 24680),
    (370000037, 11111),
    (299999977, 77777),
    (199999991, 55555),
]


def portable_hash(col: Column) -> Column:
    """60-bit deterministic hash identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


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
    return (
        d.select("doc_id", F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_id")
    )


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


def _shingles(col: Column, k: int = 3) -> Column:
    """Distinct word k-shingles as an array<string> (scalar expression).
    Used by the exact-Jaccard verifier (explode-once path)."""
    toks = F.split(F.trim(col), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )


# Hashed-token shingles: md5 once per TOKEN, then a 3-token window combined
# arithmetically — ~3x cheaper than building shingle strings and hashing
# each (string concat + per-shingle md5 dominated the sf0.1 profile).
# Identical formulation in the DuckDB oracle, so hash parity holds.
_SH_C1 = 1000003
_SH_C2 = 999983


def _shingle_combine(th: Column) -> Column:
    """Combine a token-hash array column into distinct 3-window shingle
    hashes. IMPORTANT: ``th`` must be a materialized column reference —
    Spark does not CSE subexpressions inside higher-order-function
    lambdas, so passing the hash-array *expression* here re-evaluates it
    per element_at → O(tokens²) md5 calls (measured 7x slowdown)."""
    n = F.size(th)
    idx = F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: (
                F.element_at(th, i) * _SH_C1
                + F.coalesce(F.try_element_at(th, i + 1), F.lit(0).cast("long")) * _SH_C2
                + F.coalesce(F.try_element_at(th, i + 2), F.lit(0).cast("long"))
            )
            % MERSENNE_P,
        )
    )


def with_hashed_shingles(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh): staged projections — tokens→hashes materialized as a
    column between stages (CollapseProject keeps multi-use non-cheap
    producers separate, so md5 runs once per token)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    th = F.transform(toks, lambda t: portable_hash(t) % MERSENNE_P)
    return df.select("doc_id", th.alias("th")).select(
        "doc_id", _shingle_combine(F.col("th")).alias("sh")
    )


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


def minhash_sig(hashes: Column) -> Column:
    """All 8 minhash slots in ONE pass: a single `aggregate` over the
    (already-hashed) shingle array. Crucial at scale: expressing each slot
    as its own `array_min(transform(...))` re-evaluates the shingle array
    8× (measured 8x slower at sf0.1)."""
    init = F.array(*[F.lit(MERSENNE_P).cast("long")] * len(MINHASH_COEFS))
    return F.aggregate(
        hashes,
        init,
        lambda acc, h: F.array(
            *[
                F.least(
                    F.element_at(acc, j + 1), (F.lit(a) * h + F.lit(b)) % MERSENNE_P
                )
                for j, (a, b) in enumerate(MINHASH_COEFS)
            ]
        ),
    )


def minhash_cols(sig_arr: Column) -> list[Column]:
    return [
        F.element_at(sig_arr, j + 1).alias(f"mh{j}") for j in range(len(MINHASH_COEFS))
    ]


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
    return (
        with_hashed_shingles(d)
        .select("doc_id", minhash_sig(F.col("sh")).alias("sig"))
        .select("doc_id", *minhash_cols(F.col("sig")))
        .orderBy("doc_id")
    )


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
    sig = (
        with_hashed_shingles(d)
        .select("doc_id", minhash_sig(F.col("sh")).alias("sig"))
        .select("doc_id", *minhash_cols(F.col("sig")))
    )
    sig.cache()
    # Bands carry the FULL signature: the self-join on (band, h1, h2) then
    # yields both sides' signatures in one shuffle — no second join back
    # to the signature table (was 3 joins; the band key distributes the
    # shuffle uniformly at scale).
    bands = None
    for band in range(4):
        part = sig.select(
            "doc_id",
            *[f"mh{j}" for j in range(8)],
            F.lit(band).alias("band"),
            F.col(f"mh{2 * band}").alias("h1"),
            F.col(f"mh{2 * band + 1}").alias("h2"),
        )
        bands = part if bands is None else bands.unionByName(part)
    a = bands.alias("a")
    b = bands.alias("b")
    matches = sum(
        F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0) for j in range(8)
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h1") == F.col("b.h1"))
            & (F.col("a.h2") == F.col("b.h2"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (matches / F.lit(8.0)).alias("est_raw"),
        )
        .groupBy("doc_a", "doc_b")  # dedup pairs colliding in >1 band
        .agg(F.round(F.max("est_raw"), 6).alias("est_jaccard"))
        .orderBy("doc_a", "doc_b")
    )


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
    sh = d.select("doc_id", F.explode(_shingles(F.col("text"))).alias("s"))
    sh.cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.1)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit) over word tokens: per-bit weighted vote of token hashes.
# ---------------------------------------------------------------------------


def _simhash_sql() -> str:
    toks = "LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))"
    hs = f"LIST_TRANSFORM({toks}, t -> {_sql_hash('t')})"
    bits = " + ".join(
        f"(CASE WHEN LIST_SUM(LIST_TRANSFORM(hs, h -> CASE WHEN (h // {1 << i}) % 2 = 1 "
        f"THEN 1 ELSE -1 END)) >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM (SELECT doc_id, {hs} AS hs FROM documents) t ORDER BY doc_id"


@query("q_simhash", oracle=_simhash_sql(), tags=("llm", "dedup"))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    hs = F.transform(toks, portable_hash)
    simhash = None
    for i in range(32):
        vote = F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc
            + F.when((h.bitwiseAND(F.lit(1 << i))) != 0, 1).otherwise(-1),
        )
        bit = F.when(vote >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return (
        d.select("doc_id", hs.alias("hs"))
        .select("doc_id", simhash.cast("long").alias("simhash"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Embedding similarity search.
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float> columns, computed in double.
    NULL (not DIVIDE_BY_ZERO under ANSI mode) for zero-norm vectors."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, v: s + v * v))
    return dot / F.nullif(na * nb, F.lit(0.0))


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
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    # Broadcast the small query set; candidates stream through map-side.
    pairs = e.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score")
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


@query("q_cosine_topk_ivf", oracle=_IVF_ORACLE, tags=("llm", "similarity"))
def q_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cemb")
    )
    # Assignment: every vector scored against the broadcast codebook.
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cid"))
    assign = (
        e.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "embedding", "cid", cosine(F.col("embedding"), F.col("cemb")).alias("csim")
        )
        .withColumn("crk", F.row_number().over(w_assign))
        .filter(F.col("crk") == 1)
        .select("vec_id", "embedding", "cid")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("cid"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "q_emb", "cid", cosine(F.col("q_emb"), F.col("cemb")).alias("csim"))
        .withColumn("crk", F.row_number().over(w_probe))
        .filter(F.col("crk") <= 2)
        .select("query_id", "q_emb", "cid")
    )
    cand = probes.join(assign, "cid").filter(F.col("vec_id") != F.col("query_id"))
    w_top = Window.partitionBy("query_id").orderBy(F.desc("raw_score"), F.asc("vec_id"))
    return (
        cand.select(
            "query_id", "vec_id", cosine(F.col("q_emb"), F.col("embedding")).alias("raw_score")
        )
        .withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") <= 5)
        .select("query_id", "vec_id", F.round("raw_score", 6).alias("score"), "rk")
        .orderBy("query_id", "rk")
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


@query("q_embedding_nearest_neighbor", oracle=_NN_ORACLE, tags=("llm", "similarity", "dedup"))
def q_embedding_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id"), F.col("embedding"))
    b = e.select(F.col("vec_id").alias("nn_id"), F.col("embedding").alias("b_emb"))
    pairs = a.crossJoin(b).filter(F.col("vec_id") != F.col("nn_id"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("raw_score"), F.asc("nn_id"))
    return (
        pairs.select(
            "vec_id", "nn_id", cosine(F.col("embedding"), F.col("b_emb")).alias("raw_score")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "nn_id", F.round("raw_score", 6).alias("score"))
        .orderBy("vec_id")
    )


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


# Multimodal feature extraction in the gate (rows-only: binary payloads
# and the deterministic fake decoder aren't SQL-expressible). Payloads are
# synthesized from documents so the query runs on the standard testdata.


@query("q_multimodal_features", oracle=None, tags=("llm", "multimodal"))
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


# ---------------------------------------------------------------------------
# Text analysis: token counting, quality scoring, language ID heuristic,
# document fingerprinting. All scalar codegen'd expressions.
# ---------------------------------------------------------------------------

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

_TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
       CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-zA-Z]+')) AS BIGINT) AS n_words,
       ROUND(CAST(LEN(REPLACE(text, ' ', '')) AS DOUBLE) / LENGTH(text), 6) AS nonspace_ratio,
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
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_tokens = F.size(toks)
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-zA-Z]+"), 0))
        .cast("long")
        .alias("n_words"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.length("text"),
            6,
        ).alias("nonspace_ratio"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("stopword_ratio"),
        F.round(n_tokens.cast("double") / F.size(F.array_distinct(toks)), 6).alias("repetition"),
    ).orderBy("doc_id")


# Quality score: weighted combination of the stats — the "keep or drop"
# signal of a training-data pipeline.

_QUALITY_ORACLE = """
SELECT doc_id, quality,
       CASE WHEN quality >= 0.5 THEN 1 ELSE 0 END AS keep
FROM (
  SELECT doc_id,
         ROUND(LEAST(1.0, CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE) / 60)
               * 0.5
               + (1.0 - LEAST(1.0, CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE)
                                   / GREATEST(LEN(LIST_DISTINCT(STRING_SPLIT_REGEX(TRIM(text), '\\s+'))), 1) / 5))
               * 0.5, 6) AS quality
  FROM documents
) t
ORDER BY doc_id
"""


@query("q_text_quality", oracle=_QUALITY_ORACLE, tags=("llm", "text"))
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks).cast("double")
    uniq = F.greatest(F.size(F.array_distinct(toks)), F.lit(1)).cast("double")
    length_score = F.least(F.lit(1.0), n / 60)
    rep_penalty = F.lit(1.0) - F.least(F.lit(1.0), n / uniq / 5)
    quality = F.round(length_score * 0.5 + rep_penalty * 0.5, 6)
    return d.select(
        "doc_id",
        quality.alias("quality"),
        F.when(quality >= 0.5, 1).otherwise(0).alias("keep"),
    ).orderBy("doc_id")


# Language ID: n-gram/stopword-hit heuristic with a deterministic argmax.

_LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "de": ("der", "und", "ist", "das"),
    "fr": ("le", "et", "est", "les"),
    "es": ("el", "y", "es", "los"),
}


def _lang_hits_sql(lang: str) -> str:
    words = _LANG_MARKERS[lang]
    return (
        f"LEN(LIST_FILTER(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+'), "
        f"t -> LIST_CONTAINS({list(words)}, t)))"
    )


_LANGID_ORACLE = f"""
SELECT doc_id,
       CAST(en_hits AS BIGINT) AS en_hits, CAST(de_hits AS BIGINT) AS de_hits,
       CAST(fr_hits AS BIGINT) AS fr_hits, CAST(es_hits AS BIGINT) AS es_hits,
       CASE WHEN en_hits >= de_hits AND en_hits >= fr_hits AND en_hits >= es_hits AND en_hits > 0 THEN 'en'
            WHEN de_hits >= fr_hits AND de_hits >= es_hits AND de_hits > 0 THEN 'de'
            WHEN fr_hits >= es_hits AND fr_hits > 0 THEN 'fr'
            WHEN es_hits > 0 THEN 'es'
            ELSE 'unknown' END AS pred_lang
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


@query("q_language_id", oracle=_LANGID_ORACLE, tags=("llm", "text"))
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    hits = {}
    for lang, words in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    df = d.select(
        "doc_id",
        hits["en"].cast("long").alias("en_hits"),
        hits["de"].cast("long").alias("de_hits"),
        hits["fr"].cast("long").alias("fr_hits"),
        hits["es"].cast("long").alias("es_hits"),
    )
    en, de, fr, es = (F.col(c) for c in ("en_hits", "de_hits", "fr_hits", "es_hits"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), "en")
        .when((de >= fr) & (de >= es) & (de > 0), "de")
        .when((fr >= es) & (fr > 0), "fr")
        .when(es > 0, "es")
        .otherwise("unknown")
    )
    return df.withColumn("pred_lang", pred).orderBy("doc_id")


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
    d = load(spark, sf_dir, "documents")
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1)), F.lit(4))
    hashes = F.transform(idx, lambda i: F.md5(F.substring(F.col("text"), i, F.lit(8))))
    return d.select(
        "doc_id",
        F.array_min(hashes).alias("fp_min"),
        F.array_max(hashes).alias("fp_max"),
    ).orderBy("doc_id")
