"""Corpus-curation operators for training-data pipelines: document
chunking, deterministic source mixing, stratified sampling, quantile
quality cuts, and PII/noise scrubbing.

These extend the reference's capability surface the way the LLM ops do
(SURVEY.md §2.2 "LLM-data-pipeline extensions") — each is a pure
DataFrame transformation built from codegen'd expressions, no Python in
the hot path, and each has a DuckDB-expressible definition so the gate
can hash-verify it.

Scale notes (the 100 TB contract):
- ``chunk_tokens`` is a narrow per-row op (sequence + posexplode); the
  row blowup is inherent to chunking, the work is one scan, no shuffle.
- ``mix_sources`` / ``hash_sample`` are stateless hash-Bernoulli filters
  — pushed to the scan, no shuffle, deterministic across retries (a
  ``rand()`` sample is NOT retry-stable on task re-execution; a content
  hash is).
- ``stratified_sample`` shuffles once on the stratum key; at extreme
  scale pre-prune with ``hash_sample`` so the window sees a bounded
  candidate set per stratum instead of the full table.
- ``quality_quantile_cut`` computes per-group thresholds as a TINY
  aggregate (|groups| rows) broadcast back — never a percent_rank
  window over an SF-growing partition (languages are few; such a window
  would put a whole language in one task).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rspl_spark.operators.dedup import portable_hash
from rspl_spark.operators.timeseries import _bt as _ts_bt

SAMPLE_MOD = 1_000_000


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split each document into overlapping token-window chunks
    (window tokens long, advancing by stride — the standard LLM
    pretraining chunker; stride < window gives window-stride overlap).

    Output: (id, chunk_idx, chunk_text, n_chunk_tokens), one row per
    chunk, last chunk possibly short but never empty.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    # NULL text behaves like empty text (one empty chunk) — unguarded
    # it produced a garbage (NULL chunk_text, NULL n_chunk_tokens) row;
    # same coalesce discipline as pii_scrub/line_dedup
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    piece = F.col("_start")  # 1-based token offset of this chunk
    return (
        df.select(id_col, toks.alias("_toks"), F.posexplode(starts).alias("_i", "_start"))
        .select(
            id_col,
            F.col("_i").cast("long").alias("chunk_idx"),
            F.array_join(F.slice("_toks", piece, window), " ").alias("chunk_text"),
            F.size(F.slice("_toks", piece, window)).cast("long").alias("n_chunk_tokens"),
        )
    )


def sample_hash(*cols: Column) -> Column:
    """Deterministic uniform sampling key in [0, SAMPLE_MOD): portable
    60-bit md5 hash of the concatenated key, reduced mod 10^6. Identical
    in DuckDB (see queries.curation._SQL_SAMPLE_HASH); stable across
    task retries, unlike rand()."""
    return portable_hash(F.concat_ws(":", *cols)) % SAMPLE_MOD


def _split_weight(w: float) -> tuple[int, int]:
    """(full_copies, fractional_ppm) of a mixing weight — integer parts
    so Spark and DuckDB never disagree on float rounding."""
    if w < 0.0:
        raise ValueError(f"mixing weight must be >= 0, got {w}")
    full = int(w)
    return full, round((w - full) * SAMPLE_MOD)


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    default_rate: float,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted source mixing: each row of source s is
    emitted ``weights.get(s, default_rate)`` times in expectation,
    decided by a content hash (retry-stable, reproducible across runs
    and engines — a rand() sample is neither).

    Weights may exceed 1 (upsampling, the corpus-assembly "data mixing"
    knob for high-quality sources): a weight w emits floor(w) full
    copies of every row plus one extra copy of rows whose hash falls
    under frac(w) — so w=2.5 repeats every row twice and half the rows
    a third time. When upsampling is in play the output gains a
    ``copy_idx`` column (1-based) distinguishing the repeats; when every
    weight is <= 1 the op stays a pure scan-pushed filter with the input
    schema (no explode, no extra column).

    Scale: the <=1 path is a stateless filter at the scan; the
    upsampling path is a narrow per-row explode of at most ceil(w)
    elements — no shuffle either way.
    """
    fulls_ppms = {s: _split_weight(w) for s, w in weights.items()}
    d_full, d_ppm = _split_weight(default_rate)
    full_e, ppm_e = F.lit(d_full), F.lit(d_ppm)
    for s, (fw, pw) in sorted(fulls_ppms.items()):
        full_e = F.when(F.col(source_col) == s, F.lit(fw)).otherwise(full_e)
        ppm_e = F.when(F.col(source_col) == s, F.lit(pw)).otherwise(ppm_e)
    key = sample_hash(F.col(source_col), F.col(id_col).cast("string"))
    n_copies = full_e + F.when(key < ppm_e, F.lit(1)).otherwise(F.lit(0))
    if max([default_rate, *weights.values()], default=default_rate) <= 1.0:
        return df.filter(n_copies > 0)
    if "copy_idx" in df.columns:
        raise ValueError(
            "input already has a 'copy_idx' column; rename it before an "
            "upsampling mix (weights > 1 emit one)"
        )
    # sequence(1, 0) would step BACKWARDS to [1, 0]; a NULL instead makes
    # explode drop the zero-copy rows. explode must be the top-level
    # expression (generators can't nest), so the long cast is a second step.
    copies = F.when(n_copies >= 1, F.sequence(F.lit(1), n_copies.cast("int")))
    return df.withColumn("copy_idx", F.explode(copies)).withColumn(
        "copy_idx", F.col("copy_idx").cast("long")
    )


def token_length_histogram(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
    bucket_width: int = 64,
) -> DataFrame:
    """Token-budget accounting: per (source, length-bucket) document and
    token totals — the corpus-shape report every packing/mixing decision
    starts from. One narrow projection + one partial-agg shuffle keyed on
    (source, bucket); the bucket key is bounded by max doc length, so the
    aggregate stays tiny at any corpus scale.

    Output: (source, bucket, bucket_lo, n_docs, n_tokens).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    nt = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    bucket = F.floor(nt / bucket_width).cast("long")
    return (
        df.select(source_col, bucket.alias("bucket"), nt.alias("_nt"))
        .groupBy(source_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * bucket_width).cast("long"))
    )


def quality_weighted_sample(
    df: DataFrame,
    score_col: Column,
    scale: float = 1.0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted downsampling (the DCLM-style "sample in
    proportion to quality" step): keep each row with probability
    clamp(score * scale, 0, 1), decided by the deterministic content
    hash — high-quality documents survive at a higher rate, and the
    decision is retry-stable and engine-replayable (score and hash are
    both pure expressions).

    A stateless filter at the scan, like ``mix_sources``'s thinning
    path; ``score`` is appended to the output for downstream audits
    (raises if the input already carries a ``score`` column — the same
    collision discipline as ``mix_sources``'s ``copy_idx`` guard).
    """
    if "score" in df.columns:
        raise ValueError(
            "input already has a 'score' column; rename it before "
            "quality_weighted_sample (the op emits one)"
        )
    clamped = F.least(
        F.greatest(F.round(score_col * scale, 6), F.lit(0.0)), F.lit(1.0)
    )
    # round-then-cast: Spark's long cast TRUNCATES while DuckDB's rounds,
    # so an integer-valued float like 499999.9999…  must be rounded
    # explicitly before the cast on both sides
    keep_ppm = F.round(clamped * SAMPLE_MOD, 0).cast("long")
    key = sample_hash(F.col(source_col), F.col(id_col).cast("string"))
    return df.withColumn("score", F.round(score_col, 6)).filter(key < keep_ppm)


def temperature_weights(
    df: DataFrame,
    tau: float,
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-scaled source-mixing weights (the multilingual /
    multi-domain rebalancing rule, Raffel et al. 2020 §3.4.3 "Unsupervised
    objectives" data mixing): sampling probability p_s ∝ count_s^tau,
    re-expressed as a per-row repeat factor r_s = p_s · N / count_s so the
    expected output corpus size stays N. tau < 1 flattens the mix — small
    sources UPSAMPLE (r > 1, served by mix_sources' repeat path), large
    sources thin.

    Driver-side: one tiny aggregate (|sources| rows) collected, weights
    rounded to 3 decimals so a SQL replay of the same arithmetic cannot
    drift across engines' last-ulp pow differences. Rounding is
    half-away-from-zero via ``floor(x*1000 + 0.5)`` — NOT Python's
    ``round()`` (banker's) — and the denominator is summed in sorted
    source order, so a SQL replay using ``FLOOR(w*1000 + 0.5)/1000`` and
    an ordered aggregate (``SUM(... ORDER BY source)``) performs the
    bit-identical IEEE operation sequence (see queries.curation
    ``_TEMP_ORACLE``); a weight landing on a .0005 boundary can no
    longer round differently across engines.
    """
    # NULL-source rows are EXCLUDED: no weight can be assigned to an
    # unnamed source, and a single NULL would crash the sorted() below
    counts = {
        r[source_col]: r["n"]
        for r in df.filter(F.col(source_col).isNotNull())
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    if not counts:
        raise ValueError(
            "temperature_weights: no non-NULL sources in the input"
        )
    n_total = sum(counts.values())
    denom = sum(c**tau for _, c in sorted(counts.items()))
    return {
        s: math.floor((c**tau / denom) * n_total / c * 1000.0 + 0.5) / 1000.0
        for s, c in sorted(counts.items())
    }


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rows ranked inside
    each stratum by their sampling hash (uniform order), ties broken by
    id; the first k survive. One shuffle on the stratum key."""
    key = sample_hash(F.lit("strat"), F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def quality_quantile_cut(
    df: DataFrame,
    score_col: Column,
    group_col: str,
    keep_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of each group by score: per-group
    threshold = exact percentile(1 - keep_frac), computed as a
    |groups|-row aggregate and broadcast-joined back (NOT a window over
    the full table — groups are few and huge at scale).

    At 100 TB swap ``F.percentile`` for ``F.approx_percentile`` (the
    exact percentile buffers each group's values on one reducer); the
    testdata gate uses the exact form so DuckDB can replay it.
    """
    if "score" in df.columns:
        raise ValueError(
            "quality_quantile_cut: input already has a 'score' column "
            "(the output carries the computed score there); rename it"
        )
    scored = df.withColumn("_score", score_col)
    cuts = scored.groupBy(group_col).agg(
        F.percentile("_score", 1.0 - keep_frac).alias("_cut")
    )
    return (
        scored.join(F.broadcast(cuts), group_col)
        .filter(F.col("_score") >= F.col("_cut"))
        .drop("_cut")
        .withColumnRenamed("_score", "score")
    )


# RE2-safe patterns (no lookaround) so Spark (Java regex) and DuckDB
# (RE2) agree byte-for-byte on every replacement.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^ \t\n]+"
LONG_DIGITS_RE = r"[0-9]{6,}"


def scrub_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails, URLs, and long digit runs; collapse whitespace.
    One chained regexp projection — a single scan, fully pushed down."""
    t = F.col(text_col)
    t = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    t = F.regexp_replace(t, URL_RE, "<URL>")
    t = F.regexp_replace(t, LONG_DIGITS_RE, "<NUM>")
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    # URL count runs against the EMAIL-SCRUBBED text (pii_scrub's
    # counting discipline): an email embedded in a URL must not bump
    # both counters for one redacted span
    after_email = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    return df.select(
        id_col,
        t.alias("clean_text"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(EMAIL_RE), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(after_email, F.lit(URL_RE), 0))
        .cast("long")
        .alias("n_urls"),
    )


def weighted_sample_topk(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-size weighted sampling without replacement — the
    Efraimidis–Spirakis A-ES scheme (2006, concept attribution) made
    deterministic: each row gets key = ln(u)/w with u a hash-derived
    uniform from its id, and the k LARGEST keys are the sample. Unlike
    Bernoulli thinning (:func:`quality_weighted_sample`) the output size
    is exactly k, and inclusion probability scales with weight.

    Distributed shape: the key is a pure codegen projection and the
    selection is a global top-k — TakeOrderedAndProject, i.e.
    per-partition heaps + one tiny merge, never a full sort. Weights
    must be strictly positive (guarded)."""
    from rspl_spark.operators.dedup import portable_hash

    h = portable_hash(F.col(id_col).cast("string"))
    # (h+1) / (2^60+1): u in (0,1). h can exceed 2^53, so h+1.0 is NOT
    # exact in doubles — cross-engine agreement holds because BOTH
    # engines apply the same IEEE long->double promotion, and any ids
    # whose u collapse to equal keys fall to the id tiebreaker below.
    u = (h + F.lit(1).cast("double")) / F.lit(float((1 << 60) + 1))
    w = weight.cast("double")
    key = F.when(w > 0, F.log(u) / w).otherwise(F.lit(None))
    return (
        df.select(id_col, key.alias("es_key"))
        .filter(F.col("es_key").isNotNull())
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )


def thin_hot_keys(
    df: DataFrame,
    key_col: str,
    max_rows_per_key: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Bot-flood guard: keys holding more than ``max_rows_per_key`` rows
    are deterministically Bernoulli-thinned to ~that many expected rows;
    healthy keys pass untouched.

    The classic hot-key failure is a crawler loop or bot account whose
    single key holds millions of rows: every downstream per-key op
    (sessionize, FSM interpretation, window ranks) serializes on it. A
    per-key row_number cap IS itself a skewed window — this op avoids
    it: one groupBy count keyed on ``key_col`` (the survivors of the
    HAVING are hot keys only — a small broadcast however big the
    corpus), then a pure-codegen hash-ratio filter. Deterministic
    (hash, not rand()): stable across retries and replayable in SQL.

    At a vocabulary too large even for the count shuffle, prefilter
    candidate hot keys with the count-min sketch
    (operators/sketches.cms_estimate) and pass only suspects here.
    Keep-ratio uses FLOOR on both engines (DuckDB CAST(double AS
    BIGINT) rounds, Spark's truncates — floor sidesteps the mismatch),
    with a GREATEST(..., 1) floor-of-the-floor: when a key's count
    exceeds max_rows_per_key * SAMPLE_MOD the raw ratio quantizes to 0
    and would drop the ultra-hot key ENTIRELY — exactly the bot-flood
    key the op exists to thin. The guard keeps ~n / SAMPLE_MOD rows
    for such keys instead of zero.
    """
    if max_rows_per_key < 1:
        raise ValueError("max_rows_per_key must be >= 1")
    hot = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .filter(F.col("_n") > max_rows_per_key)
    )
    keep = F.greatest(
        F.floor(
            F.lit(float(max_rows_per_key * SAMPLE_MOD)) / F.col("_n").cast("double")
        ),
        F.lit(1),
    )
    u = sample_hash(
        F.lit("thin"), F.col(key_col).cast("string"), F.col(id_col).cast("string")
    )
    # eqNullSafe: a USING join can never match a NULL key, so a
    # NULL-keyed flood (missing user id — exactly the dirty-data flood
    # this op guards against) would pass through entirely unthinned.
    # sample_hash is already NULL-safe (concat_ws skips NULLs).
    hot = hot.withColumnRenamed(key_col, "_hot_key")
    return (
        df.join(
            F.broadcast(hot),
            F.col(key_col).eqNullSafe(F.col("_hot_key")),
            "left",
        )
        .filter(F.col("_n").isNull() | (u < keep))
        .drop("_hot_key", "_n")
    )


# --- PII scrubbing ----------------------------------------------------------

# Pattern set restricted to the Java-regex ∩ RE2 common dialect
# (character classes, bounded repetition, \b) so the DuckDB oracle
# replays every redaction byte-for-byte. Order matters and is part of
# the contract: emails first (an email contains no IP/phone match, but
# scrubbing digits first could split one), then IPs, then phones.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
)

# Credit-card pattern with CHECKSUM validation: a bare \d{13,19} regex
# over-redacts (order ids, timestamps, EANs are digit runs too), so the
# candidate window is Luhn-gated — only runs whose check digit
# validates are redacted; everything else is left byte-intact. A
# 4-tuple entry names its validator; pii_scrub applies it between
# extraction and replacement.
CC_PATTERN: tuple[str, str, str, str] = ("cc", r"\b\d{13,19}\b", "[CC]", "luhn")


def luhn_valid(c: Column) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digit-run string column as a
    pure integer codegen expression — no UDF, and the same arithmetic
    is expressible in any SQL engine (the oracle replays it with
    LIST_TRANSFORM/RANGE): position i counted from the RIGHT, even
    positions double-and-fold (2d - 9 when 2d > 9), total % 10 == 0."""
    L = F.length(c)
    digit = lambda i: F.ascii(c.substr(L - i + 1, F.lit(1))) - 48  # noqa: E731
    term = lambda i: F.when(  # noqa: E731
        i % 2 == 0,
        digit(i) * 2 - F.when(digit(i) > 4, F.lit(9)).otherwise(F.lit(0)),
    ).otherwise(digit(i))
    total = F.aggregate(
        F.transform(F.sequence(F.lit(1), L), term), F.lit(0), lambda a, v: a + v
    )
    return F.pmod(total, F.lit(10)) == 0


_PII_VALIDATORS = {"luhn": luhn_valid}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
) -> DataFrame:
    """Redact PII spans (emails, IPv4s, phone numbers by default) and
    count what was removed per document — the compliance pass every
    training-data pipeline runs before anything else sees the text.

    Sibling of :func:`scrub_text` (the fixed noise pass: emails/URLs/
    digit runs + whitespace collapse): this one takes a CONFIGURABLE
    ordered pattern registry and reports per-kind counts plus a total,
    which is what an auditable redaction log needs.

    Returns (id, clean_text, n_<name> per pattern, n_redactions).
    Counts are taken against the PREVIOUS pattern's output (same text
    each replacement sees), so overlapping pattern families can't
    double-count one span. Pure codegen (regexp_extract_all +
    regexp_replace chain) — a narrow projection, no shuffle, no
    Python; at 100 TB this runs at scan speed and composes into the
    cleaning pipeline's single pass.

    NULL contract: a null ``text_col`` is treated as the empty string
    — clean_text = '' with every count 0. Without the coalesce,
    regexp_extract_all(NULL) is NULL, F.size(NULL) is -1, and the
    redaction log would record negative counts for null rows."""
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    names = []
    for entry in patterns:
        name, pat, token = entry[0], entry[1], entry[2]
        names.append(name)
        validator = _PII_VALIDATORS[entry[3]] if len(entry) > 3 else None
        if validator is None:
            counts.append(
                F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
                .cast("long")
                .alias(f"n_{name}")
            )
            cur = F.regexp_replace(cur, pat, token)
        else:
            # validated pattern: extract candidates, keep only the ones
            # the checksum accepts, fold a \b-anchored literal replace
            # per accepted candidate (a plain regexp_replace would also
            # hit the rejected false positives)
            valid = F.filter(
                F.regexp_extract_all(cur, F.lit(pat), F.lit(0)), validator
            )
            counts.append(F.size(valid).cast("long").alias(f"n_{name}"))
            cur = F.aggregate(
                valid,
                cur,
                lambda acc, cand: F.regexp_replace(
                    acc,
                    F.concat(F.lit(r"\b"), cand, F.lit(r"\b")),
                    F.lit(token),
                ),
            )
    out = df.select(id_col, cur.alias("clean_text"), *counts)
    total = None
    for name in names:
        c = F.col(f"n_{name}")
        total = c if total is None else total + c
    return out.withColumn("n_redactions", total.cast("long"))


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    alpha_num: int,
    alpha_den: int = 100,
    keep_bounds: bool = False,
) -> DataFrame:
    """Per-group winsorization at EXACT order statistics: values below
    the rank-⌈α·n⌉ smallest (or above the symmetric upper rank) clip to
    those bounds. Adds ``clipped`` plus ``clip_lo``/``clip_hi`` flags;
    NULL values pass through unclipped (flags 0).

    Rank-based, not interpolated: the bounds are actual data values
    picked by integer rank (α as the exact rational num/den), so an
    independent engine reproduces them bit-for-bit — interpolating
    percentile definitions differ across engines, ranks don't.

    Scale: one shuffle on the group key for the ranking window; the
    per-group bound table is group-cardinality-sized and broadcasts
    back. Outlier clipping before aggregation/training is the standard
    heavy-tail guard for quality scores and latency-style metrics.
    """
    if not group_cols:
        raise ValueError("winsorize: need at least one group column")
    if not (0 < alpha_num * 2 < alpha_den):
        raise ValueError("winsorize: need 0 < alpha < 0.5")
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wn = Window.partitionBy(*group_cols)
    ranked = df.filter(v.isNotNull()).select(
        *group_cols,
        v.alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    k_lo = F.expr(f"(_n * {alpha_num} + {alpha_den - 1}) div {alpha_den}")
    bounds = (
        ranked.select(
            *group_cols,
            "_v",
            "_rn",
            k_lo.alias("_klo"),
            (F.col("_n") + 1 - k_lo).alias("_khi"),
        )
        .filter((F.col("_rn") == F.col("_klo")) | (F.col("_rn") == F.col("_khi")))
        .groupBy(*group_cols)
        .agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    )
    # eqNullSafe join: NULL is a group (the window partitions it like
    # any other), but a USING join can never match it back — NULL-group
    # outliers would pass through unclipped with NULL clip flags
    b = bounds
    for c in group_cols:
        b = b.withColumnRenamed(c, f"_b_{c}")
    cond = None
    for c in group_cols:
        e = F.col(c).eqNullSafe(F.col(f"_b_{c}"))
        cond = e if cond is None else (cond & e)
    out = df.join(F.broadcast(b), cond, "left").drop(
        *[f"_b_{c}" for c in group_cols]
    )
    clipped = F.when(v.isNull(), F.lit(None)).otherwise(
        F.least(F.greatest(v, F.col("_lo")), F.col("_hi"))
    )
    out = (
        out.withColumn("clipped", clipped)
        .withColumn(
            "clip_lo", (v.isNotNull() & (v < F.col("_lo"))).cast("long")
        )
        .withColumn(
            "clip_hi", (v.isNotNull() & (v > F.col("_hi"))).cast("long")
        )
    )
    if keep_bounds:
        return out.withColumnRenamed("_lo", "bound_lo").withColumnRenamed(
            "_hi", "bound_hi"
        )
    return out.drop("_lo", "_hi")


def consolidate_records(
    df: DataFrame,
    key_cols: list[str],
    priority: list[tuple[str, str]],
    value_cols: list[str] | None = None,
    completeness_first: bool = False,
) -> DataFrame:
    """Golden-record consolidation (survivorship): collapse each key's
    duplicate candidate records to ONE row — the highest-priority
    record, with each value column backfilled by the FIRST NON-NULL
    value scanning the key's records in priority order. The
    entity-resolution endgame: dedup finds the duplicate cluster;
    this decides what the surviving record SAYS.

    ``priority`` is a list of (column, "asc"|"desc") sort keys defining
    the survivorship order; make it TOTAL per key (end with a unique
    id) or the winner under ties is nondeterministic — the same
    contract as transition_matrix's tiebreak. With
    ``completeness_first=True`` a computed non-null-field count over
    ``value_cols`` is prepended (desc) — "most complete record wins,
    then the explicit priority".

    ``value_cols`` defaults to every non-key column not used only for
    ordering... precisely: every column of ``df`` except ``key_cols``.
    Output: key_cols + value_cols (golden values), one row per key.

    Scale shape: ONE shuffle on the key, one sort per partition, one
    window pass computing row_number + per-column first-ignore-nulls
    over the full key frame — no self-joins, no driver work. 100 TB
    note: a pathological key with millions of duplicates serializes
    into one task's sort; duplicate-cluster sizes are bounded by
    upstream dedup in practice (thin_hot_keys is the guard if not).
    """
    if not priority:
        raise ValueError("consolidate_records: priority must be non-empty")
    vcols = (
        list(value_cols)
        if value_cols is not None
        else [c for c in df.columns if c not in key_cols]
    )
    if not vcols:
        raise ValueError("consolidate_records: no value columns")
    order = []
    if completeness_first:
        n_nonnull = sum(
            (F.col(c).isNotNull().cast("int") for c in vcols), F.lit(0)
        )
        order.append(n_nonnull.desc())
    for c, d in priority:
        if d not in ("asc", "desc"):
            raise ValueError(f"consolidate_records: direction {d!r}")
        order.append(F.col(c).desc() if d == "desc" else F.col(c).asc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sel = list(key_cols)
    for c in vcols:
        sel.append(F.first(F.col(c), ignorenulls=True).over(frame).alias(c))
    return (
        df.select(*df.columns, F.row_number().over(w).alias("_rn"))
        .select(*sel, "_rn")
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdf_match(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_grid: int = 1000,
    out_col: str = "calibrated",
    reference_df: DataFrame | None = None,
    rank_col: str = "pct_rank",
) -> DataFrame:
    """Cross-source score calibration by CDF matching: map each group's
    ``value_col`` onto the REFERENCE distribution at the value's
    within-group percent rank — after which "top 10% by score" means
    the same thing in every source, the property corpus mixing needs
    (a quality model scored on source A is not comparable to source
    B's scorer until both are rank-aligned).

    Reference = the pooled ``df`` itself (default) or
    ``reference_df[value_col]``. The reference CDF is an exact
    ``n_grid+1``-point percentile grid (ONE aggregation pass, a single
    broadcast array — never a per-row percentile call); a row's
    calibrated score linearly interpolates the grid at its
    ``percent_rank`` (tie-aware, hence deterministic under shuffle).

    Rows with NULL ``value_col`` are DROPPED (calibrating a missing
    score is undefined; pre-fill if you want them carried). An empty
    or all-NULL reference raises (silent NULL calibrated scores would
    make a downstream "top 10% by calibrated" select nothing). Scale
    shape: one shuffle on ``group_cols`` for the rank window; the
    reference grid is ONE aggregation read to the driver (n_grid+1
    doubles — a bounded scalar read, same class as sketch codebooks)
    and inlined as literals, so the per-row path is pure codegen.
    A single-row group gets percent_rank 0 (both engines define it so)
    and calibrates to the reference minimum. The two added columns
    (``rank_col``, ``out_col``) must not already exist in ``df`` —
    silently overwriting a caller's column is how a pipeline quietly
    calibrates against the wrong ranks; rename via the parameters.
    """
    if n_grid < 1:
        raise ValueError("cdf_match: n_grid must be >= 1")
    if rank_col == out_col:
        raise ValueError(
            f"cdf_match: rank_col and out_col are both {out_col!r} — the"
            " calibrated value would silently overwrite the rank"
        )
    for c in (rank_col, out_col):
        if c in df.columns:
            raise ValueError(
                f"cdf_match: output column {c!r} already exists in the"
                " input; pass rank_col/out_col to avoid clobbering it"
            )
    ref = (reference_df if reference_df is not None else df).filter(
        F.col(value_col).isNotNull()
    )
    qs = [i / n_grid for i in range(n_grid + 1)]
    grid_vals = ref.agg(
        F.expr(
            f"percentile({_ts_bt(value_col)},"
            f" array({', '.join(repr(q) for q in qs)}))"
        ).alias("_grid")
    ).collect()[0]["_grid"]
    if grid_vals is None or any(v is None for v in grid_vals):
        raise ValueError(
            "cdf_match: reference distribution is empty (no non-NULL"
            f" {value_col!r} values)"
        )
    grid = F.array(*(F.lit(float(v)) for v in grid_vals))
    nn = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    pr = F.percent_rank().over(w)
    pos = pr * F.lit(float(n_grid))
    lo = F.floor(pos).cast("int")
    # element_at is 1-based; at pr == 1.0 the hi slot clamps to the top
    g_lo = F.element_at(grid, lo + 1)
    g_hi = F.element_at(grid, F.least(lo + 2, F.lit(n_grid + 1)))
    cal = g_lo + (g_hi - g_lo) * (pos - lo.cast("double"))
    return nn.withColumn(rank_col, pr).withColumn(out_col, F.round(cal, 6))


def group_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int] | None = None,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-free deterministic split: the assignment hashes the
    GROUP key, so every row of a group (all of a user's events, all of
    a domain's documents) lands in the SAME split — the property
    row-level splits lack and behavioral/temporal models need (a user
    straddling train and test leaks their own future). Same
    content-hash reproducibility contract as the row-level split:
    stable across runs, machines, engines, and repartitioning.

    ``weights`` maps split name → integer percent (must sum to 100);
    default 90/5/5 train/val/test. One added column; no shuffle at all
    — the assignment is a pure projection (the hash IS the
    coordination), which is the whole point at 100 TB.

    A NULL group key gets a NULL split — explicitly, not by when-chain
    fallthrough: "no group identity" cannot be assigned leakage-free
    (two NULL-keyed rows may or may not be the same group), so the row
    belongs to NO split and a ``split == 'train'`` filter excludes it
    from every one. Filter or fill NULL keys upstream if they should
    participate.
    """
    from rspl_spark.operators.dedup import portable_hash

    weights = weights or {"train": 90, "val": 5, "test": 5}
    if sum(weights.values()) != 100 or any(v <= 0 for v in weights.values()):
        raise ValueError(
            "group_split: weights must be positive integers summing to 100"
        )
    bucket = portable_hash(F.col(group_col).cast("string")) % 100
    expr = None
    acc = 0
    for name, pct in weights.items():
        acc += pct
        cond = bucket < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # NULL key → NULL split, stated rather than left to NULL-condition
    # fallthrough (docstring contract)
    return df.withColumn(
        out_col,
        F.when(F.col(group_col).isNull(), F.lit(None).cast("string"))
        .otherwise(expr),
    )
