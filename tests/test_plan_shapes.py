"""Physical-plan shape regression tests — the 100 TB properties.

Correctness gates prove the VALUES; these pin the PLANS: a refactor
that silently introduces a cartesian product, drops a broadcast, or
loses parquet filter pushdown still passes value checks at sf0.001
while becoming unrunnable at scale. Each assertion here is a property
argued in README "Scale design" / module docstrings.
"""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    from flame_spark.queries import QUERIES

    return QUERIES


def test_no_cartesian_or_nested_loop_anywhere_hot(spark, queries):
    """The headline/dedup paths must never fall back to
    CartesianProduct or BroadcastNestedLoopJoin — both are O(N^2)
    row-pair materializations that die at scale. (The r1 embed-dedup
    scale-killer was exactly a BroadcastNestedLoopJoin.)"""
    for name in [
        "t5_lno31_postings",
        "j1_tfidf_cosine_pairs",
        "dedup_minhash_lsh_pairs",
        "dedup_jaccard3_pairs",
        "dedup_embed_cosine_pairs",
        "dedup_embed_lsh_pairs",
        "j6_bm25_topk",
        "dedup_winnow_pairs",
    ]:
        plan = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_t5_join_is_broadcast_under_cutoff(spark, queries):
    """Below max_collect_vocab the token->id equi-join must resolve to
    a BroadcastHashJoin (vocab side broadcast; the exploded token rows
    are never shuffled on `tok`)."""
    plan = _plan(queries["t5_lno31_postings"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_parquet_filter_pushdown_on_scan(spark):
    """A filtered documents scan must push the predicate into the
    parquet reader (PushedFilters), not post-filter a full scan."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select("doc_id")
    )
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "LessThan(doc_id,100)" in plan
    # column pruning: the scan schema must not include `text`
    assert "ReadSchema: struct<doc_id" in plan and "text" not in plan.split(
        "ReadSchema"
    )[1].split("\n")[0]


def test_wand_query_join_broadcasts_query_terms(spark):
    """WAND's qterms x segments join must broadcast the tiny query
    side: a shuffle of the segment table per query batch would scale
    with index size, not query size."""
    from flame_spark.config import FlameConfig
    from flame_spark.fastbuild import build_serving_index
    from flame_spark.pipeline import query_terms_local, wand_bm25_topk
    from flame_spark.queries import BM25_QUERIES, _docs

    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=0, tokenizer="word",
        term_mode="lno", n_shards=4,
    )
    serving = build_serving_index(_docs(spark, SF), cfg)
    segments = serving.segments.persist()
    segments.count()
    qs = [{"query_id": q, "query_text": t} for q, t in BM25_QUERIES[:2]]
    plan = _plan(wand_bm25_topk(spark, qs, serving, segments, k=5))
    segments.unpersist()
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan
    # the big (cached) segment side must not be exchanged for the join
    # itself. The plan string embeds the cache's stored build plan
    # (REPARTITION_BY_NUM exchanges), so look only at planner-forced
    # ENSURE_REQUIREMENTS exchanges: a lost broadcast would shuffle the
    # segment side on `term`; the legitimate two are the per-
    # (query, shard) scorer grouping and the global top-k window.
    ensure = [
        l for l in plan.splitlines() if "ENSURE_REQUIREMENTS" in l
    ]
    assert not any("hashpartitioning(term" in l for l in ensure), ensure
    assert len(ensure) == 2, ensure
    # boolean retrieval shares the same join/grouping skeleton: tiny
    # clause table broadcast, segments never shuffled on `term`
    from flame_spark.pipeline import wand_boolean_topk

    segments.persist().count()
    bool_plan = _plan(
        wand_boolean_topk(
            spark,
            [{"query_id": "b", "must": "table scan merge",
              "should": "join order sort"}],
            serving, segments, k=5,
        )
    )
    segments.unpersist()
    assert "BroadcastHashJoin" in bool_plan and "BuildRight" in bool_plan
    b_ensure = [
        l for l in bool_plan.splitlines() if "ENSURE_REQUIREMENTS" in l
    ]
    assert not any("hashpartitioning(term" in l for l in b_ensure), b_ensure
    assert len(b_ensure) == 2, b_ensure


def test_whole_stage_codegen_on_t5_hot_path(spark, queries):
    """The LNO trigram hot path is all built-in expressions — it must
    compile into whole-stage codegen (no Python evals interleaved)."""
    # under AQE the pre-execution plan is an unfinalized wrapper with
    # no codegen annotation; disable it for this static inspection
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(queries["t5_lno31_postings"](spark, SF))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    # toString marks whole-stage-codegen spans with a "*(n) " prefix;
    # the final aggregate (the query's output operator) must be inside
    # one, and nothing on the plan may drop to Python row evaluation
    assert plan.lstrip().splitlines()[0].startswith("*(")
    # row-at-a-time Python must never appear; the single Arrow node
    # allowed is corpus.add_doc_id's per-partition id stamp over the
    # VOCAB-sized distinct-token table (O(vocab), not O(corpus) — the
    # token-row hot path itself stays JVM-side)
    assert "BatchEvalPython" not in plan
    mip = [l for l in plan.splitlines() if "MapInPandas" in l]
    assert mip and all("stamp" in l for l in mip), mip


def test_batch_serve_scan_is_narrow_over_cache(spark):
    """The batch serving scan must be a NARROW pass over the
    shard-partitioned segment cache: InMemoryTableScan with the term
    filter pushed against the cached batches, and no planner-forced
    exchange before the scorer — a shuffle here would re-partition the
    index per query batch (cost tracking index size, not query size)."""
    from pyspark.sql import functions as F

    from flame_spark.config import FlameConfig
    from flame_spark.fastbuild import build_serving_index
    from flame_spark.queries import _docs
    from flame_spark.wand import segments_for_serving

    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=0, tokenizer="word",
        term_mode="lno", n_shards=4,
    )
    from flame_spark.wand import TERM_FILTER_CUTOFF, _batch_term_filter

    serving = build_serving_index(_docs(spark, SF), cfg)
    cache = segments_for_serving(serving.segments, 4)
    terms = [
        int(r["term"])
        for r in cache.select("term").distinct().limit(3).collect()
    ]
    # the exact scan wand_topk_serve_batch builds (small batch: the
    # literal-In form, pushed against the cached batches)
    seg = _batch_term_filter(cache, terms).select(
        "shard", "term", "doc_deltas", "scores", "block_max"
    )
    plan = _plan(seg)
    assert "InMemoryTableScan" in plan, plan
    assert "ENSURE_REQUIREMENTS" not in plan, plan
    # the term filter reaches the cached-batch scan (batch min/max
    # pruning needs it AT the InMemoryTableScan, not above it)
    scan_part = plan[plan.index("InMemoryTableScan"):].splitlines()[0]
    assert "term" in scan_part, scan_part

    # above the cutoff the filter must become a broadcast LEFT SEMI
    # join — a 100k-literal In expression is a per-job Catalyst
    # analysis/codegen tax — and still no planner-forced exchange of
    # the cache side
    many = list(range(TERM_FILTER_CUTOFF + 5))
    big = _batch_term_filter(cache, many).select(
        "shard", "term", "doc_deltas", "scores", "block_max"
    )
    big_plan = _plan(big)
    assert "BroadcastHashJoin" in big_plan and "LeftSemi" in big_plan, big_plan
    assert " In(" not in big_plan and " IN (" not in big_plan, big_plan
    assert "ENSURE_REQUIREMENTS" not in big_plan, big_plan
    cache.unpersist()


def test_decontamination_probes_eval_via_broadcast(spark, queries):
    """The eval (benchmark) shingle set is MBs while training shingles
    are the 100 TB side: the hit-probe must be a BroadcastHashJoin —
    a shuffle join here would reshuffle the entire training corpus
    against a tiny dimension."""
    plan = _plan(queries["text_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_stratified_sample_is_jvm_only_no_shuffle_agg(spark, queries):
    """Sampling must stay a per-row codegen filter: no Python eval (the
    Arrow fingerprint UDF would be DUPLICATED by filter pushdown — the
    md5 bucket hash is JVM-side), no join, no aggregation."""
    plan = _plan(queries["text_stratified_sample"](spark, SF))
    for bad in ("ArrowEvalPython", "BatchEvalPython", "Join", "HashAggregate"):
        assert bad not in plan, bad


def test_pii_redact_is_single_projection(spark, queries):
    """The whole redaction chain (3 counts + 3 replaces) must collapse
    into Catalyst projections over the scan — no Python, no join, no
    aggregation, trivially parallel."""
    plan = _plan(queries["text_pii_redact"](spark, SF))
    for bad in ("EvalPython", "Join", "HashAggregate", "Sort"):
        assert bad not in plan, bad


def test_conv_assembly_single_shuffle_no_python(spark, queries):
    """Conversation assembly is ONE conv_id-keyed exchange feeding an
    ObjectHashAggregate (collect_list) — no join, no Python, no sort
    (ordering comes from sort_array inside the aggregate, not a
    SortExec over the full rows)."""
    plan = _plan(queries["transcript_conv_docs"](spark, SF))
    for bad in ("EvalPython", "Join", "CartesianProduct"):
        assert bad not in plan, bad
    # exactly one exchange for the groupBy (plus none for the scan side)
    n_agg_exchanges = plan.count("Exchange hashpartitioning(conv_id")
    assert n_agg_exchanges == 1, plan[:2000]


def test_conv_windows_add_no_shuffle_over_assembly(spark, queries):
    """Window cutting is a pure posexplode projection: the windows
    plan must contain Generate but NO exchange beyond the single
    assembly exchange — chunking pipelines out of the aggregation."""
    docs_plan = _plan(queries["transcript_conv_docs"](spark, SF))
    win_plan = _plan(queries["transcript_conv_windows"](spark, SF))
    assert "Generate" in win_plan  # posexplode present
    for bad in ("EvalPython", "Join", "CartesianProduct"):
        assert bad not in win_plan, bad
    assert win_plan.count("Exchange") == docs_plan.count("Exchange")


def test_ranking_analytics_gates_no_quadratic_joins(spark, queries):
    """Round-5 ranking/analytics gates: every join must stay a hash
    equi-join (broadcast or shuffled) — no CartesianProduct, no
    BroadcastNestedLoopJoin. dirichlet/prf use the np_log Arrow UDF,
    so they are exempt from zero-Python pins (like j6), but not from
    the join-shape pins."""
    for name in [
        "search_lm_dirichlet",
        "search_facets",
        "search_near_topk",
        "search_prf_topk",
        "text_keywords",
    ]:
        plan = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_near_and_facets_prune_via_broadcast_before_shuffle(spark, queries):
    """The corpus-sized position/posting streams must be pruned by a
    BroadcastHashJoin on the tiny query side before any exchange —
    the property that keeps shuffle volume proportional to matches,
    not corpus tokens."""
    for name in ["search_near_topk", "search_facets"]:
        plan = _plan(queries[name](spark, SF))
        assert "BroadcastHashJoin" in plan, name
