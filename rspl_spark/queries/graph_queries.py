"""Graph-analytics gates (operators/graph.py): PageRank over the
customer→supplier purchase graph and exact triangle counts over the
part co-order graph.

Cross-engine determinism: PageRank's per-iteration contribution sums
are float groupBy aggregates (order nondeterministic in BOTH engines)
— final ranks are rounded to 6dp, and four iterations keep the
accumulated reorder drift around 1e-15, far inside the rounding. The
oracle UNROLLS the same four synchronous iterations as plain CTEs
(same (1−d)/N + d·(contrib + dangling/N) IEEE sequence per element).
Triangle counting is exact integer work; the oracle enumerates
id-ordered triples a<b<c — a DIFFERENT formulation from the operator's
degree-orientation, so agreement checks the algorithm, not the
implementation against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rspl_spark.catalog import load
from rspl_spark.queries import query

_PR_ITERS = 4
_PR_DAMP = 0.85


def _purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed customer→supplier edges: who bought from whom. Node ids
    prefixed 'c'/'s' — the two key spaces overlap numerically. Every
    supplier node is DANGLING (no out-edges), so the gate exercises the
    dangling-mass redistribution path on half the graph."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )


def _pr_oracle() -> str:
    head = """
WITH edges AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
c{k} AS (
  SELECT e.dst AS node, SUM(r.rank / deg.d) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
d{k} AS (
  SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
  WHERE node NOT IN (SELECT src FROM deg)
),
r{k} AS (
  SELECT n.node,
         (1 - {_PR_DAMP}) / (SELECT n FROM nn)
         + {_PR_DAMP} * (COALESCE(c.contrib, 0)
                         + (SELECT dmass FROM d{k}) / (SELECT n FROM nn))
           AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
)"""
        )
    tail = f"""
SELECT node, ROUND(rank, 6) AS rank
FROM r{_PR_ITERS}
ORDER BY node
"""
    return head + "".join(its) + tail


@query("q_pagerank", oracle=_pr_oracle(), tags=("graph",))
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-iteration PageRank over the purchase graph; Spark runs the
    checkpointed power loop (operators/graph.py — one contribs shuffle
    + one rank join per iteration, lineage cut each step), the oracle
    unrolls the identical iterations as CTEs."""
    from rspl_spark.operators.graph import pagerank

    ranks = pagerank(
        _purchase_edges(spark, sf_dir), n_iter=_PR_ITERS, damping=_PR_DAMP
    )
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy(
        "node"
    )


def _wpr_oracle() -> str:
    """Weighted variant: contribution = rank · w / Σ out-weights, with
    w = number of distinct orders linking the customer to the supplier
    (edge multiplicity IS signal). Out-weight sums are integer-valued
    doubles — exact — so only the contrib sum carries float reorder
    drift, absorbed by the 6dp round like the uniform gate."""
    head = """
WITH edges AS (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
           's' || CAST(l_suppkey AS VARCHAR) AS dst, o_orderkey
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  ) GROUP BY src, dst
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
c{k} AS (
  SELECT e.dst AS node, SUM(r.rank * e.w / deg.ow) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
d{k} AS (
  SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
  WHERE node NOT IN (SELECT src FROM deg)
),
r{k} AS (
  SELECT n.node,
         (1 - {_PR_DAMP}) / (SELECT n FROM nn)
         + {_PR_DAMP} * (COALESCE(c.contrib, 0)
                         + (SELECT dmass FROM d{k}) / (SELECT n FROM nn))
           AS rank
  FROM nodes n LEFT JOIN c{k} c ON n.node = c.node
)"""
        )
    tail = f"""
SELECT node, ROUND(rank, 6) AS rank
FROM r{_PR_ITERS}
ORDER BY node
"""
    return head + "".join(its) + tail


@query("q_pagerank_weighted", oracle=_wpr_oracle(), tags=("graph",))
def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the purchase graph, edge weight = number
    of distinct orders between the pair — rank flows out proportionally
    to weight (rank · w / Σ out-weights), the multiplicity-aware form a
    purchase/co-occurrence graph wants."""
    from rspl_spark.operators.graph import pagerank

    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
            "o_orderkey",
        )
        .distinct()
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(
        edges, n_iter=_PR_ITERS, damping=_PR_DAMP, weight_col="w"
    )
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy(
        "node"
    )


def _ppr_oracle() -> str:
    """Personalized variant: the teleport vector (uniform over nation-0
    customers present in the graph) replaces 1/N in the restart term,
    the dangling redistribution, AND the initial ranks."""
    head = """
WITH edges AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
rs AS (
  SELECT DISTINCT n.node FROM nodes n
  JOIN customer c ON n.node = 'c' || CAST(c_custkey AS VARCHAR)
  WHERE c.c_nationkey = 0
),
rm AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m FROM rs),
rv AS (
  SELECT n.node,
         CASE WHEN r.node IS NOT NULL THEN 1.0 / (SELECT m FROM rm)
              ELSE 0.0 END AS reset
  FROM nodes n LEFT JOIN rs r ON n.node = r.node
),
r0 AS (SELECT node, reset AS rank FROM rv)"""
    its = []
    for k in range(1, _PR_ITERS + 1):
        p = k - 1
        its.append(
            f""",
c{k} AS (
  SELECT e.dst AS node, SUM(r.rank / deg.d) AS contrib
  FROM edges e JOIN r{p} r ON e.src = r.node JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
d{k} AS (
  SELECT COALESCE(SUM(rank), 0) AS dmass FROM r{p}
  WHERE node NOT IN (SELECT src FROM deg)
),
r{k} AS (
  SELECT v.node,
         (1 - {_PR_DAMP}) * v.reset
         + {_PR_DAMP} * (COALESCE(c.contrib, 0)
                         + (SELECT dmass FROM d{k}) * v.reset) AS rank
  FROM rv v LEFT JOIN c{k} c ON v.node = c.node
)"""
        )
    tail = f"""
SELECT node, ROUND(rank, 6) AS rank
FROM r{_PR_ITERS}
ORDER BY node
"""
    return head + "".join(its) + tail


@query("q_pagerank_personalized", oracle=_ppr_oracle(), tags=("graph",))
def q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded uniformly at nation-0 customers —
    rank mass re-enters ONLY through the seeds (restart + dangling
    both teleport by the reset vector), the 'rank everything from
    these seeds' form a recommendation pipeline actually runs. Same
    checkpointed power loop; oracle unrolls the same 4 iterations."""
    from rspl_spark.operators.graph import pagerank

    cust = load(spark, sf_dir, "customer")
    seeds = cust.where(F.col("c_nationkey") == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    ranks = pagerank(
        _purchase_edges(spark, sf_dir),
        n_iter=_PR_ITERS,
        damping=_PR_DAMP,
        reset_df=seeds,
    )
    return ranks.select("node", F.round("rank", 6).alias("rank")).orderBy(
        "node"
    )


_TRI_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e AS (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node
ORDER BY node
"""


@query("q_triangle_counts", oracle=_TRI_ORACLE, tags=("graph",))
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-order graph (parts linked
    when they appear in the same order). The operator's
    degree-orientation enumeration must agree with the oracle's naive
    id-ordered a<b<c enumeration."""
    from rspl_spark.operators.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem")
    edges = (
        li.alias("x")
        .join(
            li.alias("y"),
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst")
        )
        .distinct()
    )
    return triangle_counts(edges).orderBy("node")


_KHOP_HOPS = 3


def _khop_oracle() -> str:
    head = """
WITH pe AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
         's' || CAST(l_suppkey AS VARCHAR) AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (SELECT c AS src, s AS dst FROM pe UNION ALL SELECT s, c FROM pe),
d0 AS (
  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node, 0 AS dist
  FROM customer WHERE c_nationkey = 0
),
f0 AS (SELECT node FROM d0)"""
    its = []
    for k in range(1, _KHOP_HOPS + 1):
        p = k - 1
        its.append(
            f""",
n{k} AS (SELECT DISTINCT e.dst AS node
         FROM edges e JOIN f{p} f ON e.src = f.node),
f{k} AS (SELECT node FROM n{k} WHERE node NOT IN (SELECT node FROM d{p})),
d{k} AS (SELECT * FROM d{p} UNION ALL SELECT node, {k} AS dist FROM f{k})"""
        )
    tail = f"""
SELECT node, CAST(dist AS BIGINT) AS dist
FROM d{_KHOP_HOPS}
ORDER BY node
"""
    return head + "".join(its) + tail


@query("q_khop_distances", oracle=_khop_oracle(), tags=("graph",))
def q_khop_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frontier BFS: shortest undirected purchase-graph distance from
    nation-0 customers, within 3 hops. Exact-integer iteration; the
    oracle unrolls the same frontier expansion as CTEs."""
    from rspl_spark.operators.graph import khop_distances

    pe = _purchase_edges(spark, sf_dir)
    und = pe.union(
        pe.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    cust = load(spark, sf_dir, "customer")
    sources = cust.where(F.col("c_nationkey") == 0).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    out = khop_distances(und, sources, max_hops=_KHOP_HOPS)
    return out.select("node", "dist").orderBy("node")
