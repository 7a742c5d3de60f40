"""Physical-plan property regression suite: the plan SHAPE is the scale
contract, so assert it, don't just benchmark it. Each headline query
pins the invariants that keep it viable at 100 TB — filters reaching the
parquet scan, pruned read schemas, top-k pushdown instead of global
sorts, no cartesian products on fact tables, and no Python in plans that
claim to be codegen'd."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F  # noqa: F401

from rspl_spark.catalog import load
from rspl_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reg():
    return load_registry()


def _plan(spark, reg, name: str, mode: str = "simple") -> str:
    return (
        reg[name]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))
    )


def _final_plan(spark, reg, name: str) -> str:
    """Plan AFTER execution: AQE has finalized, so WholeStageCodegen
    spans are visible."""
    df = reg[name].fn(spark, SF)
    df.collect()
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )


def test_q1_filter_pushed_and_schema_pruned(spark, reg):
    plan = _plan(spark, reg, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # lineitem has 11 columns; Q1 must read only the 7 it touches
    rs = re.search(r"ReadSchema: struct<([^\n]*)", plan).group(1)
    assert "l_orderkey" not in rs and "l_partkey" not in rs
    # "*(n)" node prefixes are the whole-stage-codegen span markers
    assert "*(" in _final_plan(spark, reg, "q1_pricing_summary")


def test_q3_topk_pushdown_no_global_sort(spark, reg):
    plan = _plan(spark, reg, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan
    # top-k must NOT materialize as Sort + GlobalLimit
    assert "GlobalLimit" not in plan
    assert "CartesianProduct" not in plan


def test_q5_broadcasts_are_dim_only(spark, reg):
    """Bounded dims (region/nation) may carry broadcast hints; SF-scaled
    tables must reach the join unhinted (AQE decides at runtime)."""
    import rspl_spark.queries.joins as J
    import inspect

    src = inspect.getsource(J.q5_local_supplier)
    for tbl in ("customer", "supplier", "lineitem", "orders"):
        assert f"broadcast({tbl[0]}" not in src.lower().replace(" ", "")
    plan = _plan(spark, reg, "q5_local_supplier")
    assert "CartesianProduct" not in plan


def test_minhash_lsh_no_cartesian_and_single_sig_subtree(spark, reg):
    plan = _plan(spark, reg, "q_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    # banding is an equi-join: a hash-join on the band key, never BNLJ
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_neardup_is_equi_join(spark, reg):
    plan = _plan(spark, reg, "q_simhash_neardup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_compiled_dsl_chain_has_no_python(spark, reg):
    plan = _plan(spark, reg, "q_dsl_map_filter")
    assert "EvalPython" not in plan
    assert "*(" in _final_plan(spark, reg, "q_dsl_map_filter")


def test_corpus_pipeline_single_scan_single_exchange(spark, reg):
    plan = _plan(spark, reg, "q_corpus_clean_pipeline")
    assert plan.count("FileScan parquet") == 1
    # one exchange for the dedup window + the final presentation sort
    assert plan.count("Exchange") <= 2
    assert "WindowGroupLimit" in plan  # map-side keeper pruning


def test_q21_single_fact_agg_no_cartesian(spark, reg):
    plan = _plan(spark, reg, "q21_waiting_suppliers")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_window_pass(spark, reg):
    plan = _plan(spark, reg, "q_asof_join")
    # the one-pass formulation: no join node at all
    assert "Join" not in plan or "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_exact_pairs_operator_is_guarded(spark):
    """The all-pairs scorer must refuse to build a plan unless the caller
    explicitly owns the quadratic cost — no accidental O(n²) on an
    SF-scaled table through the operator API."""
    from rspl_spark.operators.similarity import exact_scored_pairs, unit_prep

    e = load(spark, SF, "embeddings")
    a = unit_prep(e, "vec_id", "a_emb", "a_nrm")
    b = unit_prep(e, "query_id", "b_emb", "b_nrm")
    with pytest.raises(ValueError, match="allow_quadratic"):
        exact_scored_pairs(a, b)
    # and with the flag it builds (plan only, no execution)
    exact_scored_pairs(a, b, allow_quadratic=True).explain(mode="simple")


def test_similarity_queries_no_cartesian_outside_anchors(spark, reg):
    """Every similarity-tagged query except the two DECLARED brute-force
    oracle anchors must plan without a cartesian product."""
    anchors = {"q_cosine_topk_bruteforce", "q_embedding_nearest_neighbor"}
    checked = 0
    for name, spec in reg.items():
        if "similarity" in spec.tags and name not in anchors:
            plan = _plan(spark, reg, name)
            assert "CartesianProduct" not in plan, name
            checked += 1
    assert checked >= 5  # the ANN/pair-mining family is covered


def test_events_scan_prunes_props(spark):
    """Metadata-only event queries must not read the wide JSON props
    column."""
    e = load(spark, SF, "events")
    agg = e.groupBy("event_type").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    rs = plan.split("ReadSchema:")[-1]
    assert "props" not in rs


def test_q9_lineitem_joins_all_broadcast(spark, reg):
    """Q9's fact-side joins (part-pruned partsupp, supplier, nation)
    must all broadcast — lineitem is never shuffled before the final
    (nation, year) aggregate; orders joins on the orderkey shuffle."""
    plan = _plan(spark, reg, "q9_product_type_profit")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    # p_name filter reaches the part scan
    assert "PushedFilters: [IsNotNull(p_name)" in plan or "Contains(p_name,red)" in plan


def test_q2_window_min_not_rejoined_subquery(spark, reg):
    """The correlated MIN-per-part subquery must compile to ONE window
    over the region-filtered frame, not a re-derived subquery join."""
    plan = _plan(spark, reg, "q2_min_cost_supplier")
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan
    # partsupp derivation appears twice at most (main + none): the
    # explode of the 4-supplier array must not be duplicated per branch
    assert plan.count("Generate explode") <= 1


def test_q16_anti_join_broadcast(spark, reg):
    plan = _plan(spark, reg, "q16_parts_supplier")
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_single_lineitem_aggregate(spark, reg):
    """The correlated quantity subquery decorelates into exactly one
    aggregate over the filtered lineitem slice."""
    plan = _plan(spark, reg, "q20_potential_promotion")
    assert "CartesianProduct" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    assert "LeftSemi" in plan


def test_ivf_index_topk_scans_probed_cells_only(spark):
    """The persisted-IVF query path joins the store on cid after a
    broadcast centroid probe — no cartesian against the stored table,
    and the store scan reads only the assignment columns it needs."""
    from rspl_spark.operators.ann_store import create_ivf_index, ivf_index_topk

    emb = load(spark, SF, "embeddings")
    name = "ivfidx_plan_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    try:
        create_ivf_index(spark, emb, name, overwrite=True)
        df = ivf_index_topk(spark, name, emb.filter(F.col("vec_id") < 5))
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert "CartesianProduct" not in plan
        # probe join keyed on cid
        assert re.search(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).{0,80}cid", plan)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_repetition_signals_plan_is_map_only(spark, reg):
    """The r7 kernel formulation must have NO exchange before the final
    orderBy — the corpus is never shuffled (contrast: the r6 explode
    form shuffled three (doc, gram) streams)."""
    from rspl_spark.operators.text import repetition_signals

    d = load(spark, SF, "documents")
    plan = repetition_signals(d)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_corpus_to_shards_scans_text_once(spark, reg):
    """The end-to-end corpus->shards chain must scan the raw text
    payload ONCE up to the materialization barrier: the scrub + chunk
    stages fuse into the ONE scan projection, line dedup re-reads the
    derived frames, never the parquet. Post-barrier, the only documents
    scan allowed is the benchmark slice (doc_id < 10), which must carry
    its pushed-down filter so a 100 TB corpus reads ~10 rows for it."""
    from rspl_spark.queries.llm_ops import _c2s_base, _c2s_kept

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    # the fused scrub+chunk projection: ONE scan, regex chain on it
    pre = fmt(_c2s_base(spark, SF))
    assert pre.count("documents.parquet") == 1, "raw text scanned more than once"
    assert "regexp_replace" in pre
    # downstream of the materialization barrier, line_dedup's 4-way
    # fan-out must NOT re-reach the parquet (each re-read would re-run
    # the regex chain — the dominant per-byte cost)
    kept = fmt(_c2s_kept(spark, SF))
    assert kept.count("documents.parquet") == 0, "line dedup re-scans the corpus"
    post = _plan(spark, reg, "q_corpus_to_shards", mode="formatted")
    scans = post.count("documents.parquet")
    assert scans <= 1, f"post-barrier corpus scans: {scans}"
    assert "LessThan(doc_id,10)" in post, "benchmark filter not pushed to scan"


def test_scd2_merge_probe_joins_broadcast(spark, reg):
    """scd2_merge must touch only batch keys: the untouched pass-through
    (anti join) and the affected-version fetch (semi join) both probe a
    broadcast key set — no full-dimension shuffle join, no cartesian."""
    plan = _plan(spark, reg, "q_scd2_merge_rebuild")
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"BroadcastHashJoin .*Left(Anti|Semi)", plan)) == 2


def test_int8_topk_corpus_never_broadcast(spark, reg):
    """Quantized search streams the corpus codes against a broadcast
    query side (the non-equi self-pair join is the 10-row nested loop,
    same shape as the brute-force anchor); the rerank fetch joins on the
    candidate ids. The corpus must never be the broadcast side."""
    plan = _plan(spark, reg, "q_cosine_topk_int8")
    assert "CartesianProduct" not in plan
    # candidate scoring: broadcast nested loop on the != predicate
    assert "BroadcastNestedLoopJoin" in plan
    # WindowGroupLimit pushes the per-query candidate cut below the sort
    assert "WindowGroupLimit" in plan


def test_fuzzy_join_gate_no_quadratic_join(spark, reg):
    """The fuzzy join's candidate generation is an equi-join on prefix
    tokens; the charset-bounded vocab rank is a broadcast. Nothing in
    the plan may fall back to a quadratic join."""
    plan = _plan(spark, reg, "q_fuzzy_join_trigram")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # vocab rank join


def test_psi_all_joins_broadcast(spark, reg):
    """PSI collapses n rows to B=16 bins in ONE shuffle; the spine and
    totals attach as broadcasts — a SortMergeJoin anywhere means the
    constant-sized sides got shuffled."""
    plan = _plan(spark, reg, "q_psi_drift")
    assert "SortMergeJoin" not in plan


def test_rate_anomalies_single_event_grain_pass(spark, reg):
    """Events collapse to the (key, bucket) grain in ONE groupBy; the
    per-key moments join back as a broadcast — event-grain data crosses
    the wire exactly once."""
    plan = _plan(spark, reg, "q_rate_anomalies")
    assert "SortMergeJoin" not in plan
    assert plan.count("Scan parquet") == 1 or plan.count("FileScan") == 1


def test_chi_square_margins_derive_from_cells(spark, reg):
    """The contingency cells are the only aggregate over the data —
    margins and totals re-aggregate the r*c cell rows, never rescanning
    documents. Plan check: one parquet scan."""
    plan = _plan(spark, reg, "q_chi_square")
    assert plan.count("Scan parquet") == 1 or plan.count("FileScan") == 1


def test_hll_intersect_union_is_register_merge(spark, reg):
    """All three estimates (A, B, union) must come from ONE register
    pass — per-idx (mja, mjb) with the union register greatest(·,·) —
    never from re-deriving the corpus scan per sketch: exactly one
    parquet scan in the whole plan."""
    plan = _plan(spark, reg, "q_hll_intersect")
    n = max(plan.count("Scan parquet"), plan.count("FileScan"))
    assert n == 1


def test_edit_join_gate_no_quadratic_join(spark, reg):
    """Edit-distance candidates come from the 3k+1-rarest-token
    equi-join (no short strings in the gate data, so no broadcast
    side path); the verify step joins back by id."""
    plan = _plan(spark, reg, "q_edit_distance_join")
    assert "CartesianProduct" not in plan


def test_no_inferred_filter_above_shingle_generate(spark):
    """InferFiltersFromGenerate turns explode(<computed array>) into
    Filter(size(expr)>0) + Generate; projection pushdown then INLINES
    the staged token-hash transform into the filter condition, which is
    re-evaluated per sequence element — O(tokens^2) md5 calls per row
    (measured r15: 40.9s -> 0.13s for the corpus->shards shingle
    explode at sf0.1; plans/r15/infer_filters_from_generate_repro.txt).
    The session must exclude the rule, and the optimized plan of a
    direct shingle explode must carry NO md5-bearing Filter."""
    from rspl_spark.operators.dedup import with_hashed_shingles

    assert "InferFiltersFromGenerate" in spark.conf.get(
        "spark.sql.optimizer.excludedRules", ""
    )
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    exploded = with_hashed_shingles(df).select("doc_id", F.explode("sh").alias("s"))
    optimized = exploded._jdf.queryExecution().optimizedPlan().toString()
    for line in optimized.splitlines():
        if line.strip().startswith("+- Filter") or line.strip().startswith("Filter"):
            assert "md5" not in line, f"inferred filter inlines the hash chain: {line[:200]}"
