"""Structured-search operators (searchops.py): value semantics vs an
independent Python brute-force on a hand-built corpus, plus the
physical-plan shapes that make them scale."""

import math
import re

import pytest

SF = "/root/testdata/sf0.001"

DOCS = [
    (0, "alpha beta alpha beta beta"),
    (1, "alpha alpha alpha"),
    (2, "beta gamma alpha"),
    (3, "delta delta delta delta"),
    (4, ""),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _brute_bm25(query_terms, k1, b):
    """Independent BM25: per-doc score over the given terms (qtf=1)."""
    toks = {d: _toks(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for tk in toks.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, tk in toks.items():
        s = 0.0
        hit = False
        for t in query_terms:
            tf = tk.count(t)
            if not tf:
                continue
            hit = True
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(tk) / avgdl)
            )
        if hit:
            out[d] = s
    return out


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    from pyspark.sql import functions as F

    from flame_spark.postings import (
        build_postings, corpus_stats, doc_lengths, term_stats,
    )
    from flame_spark.textops import word_tokens_col

    docs = docs.withColumn("tokens", word_tokens_col(F.col("text")))
    postings = build_postings(docs, "tokens")
    dl = doc_lengths(docs, "tokens")
    stats_df = term_stats(postings)
    stats = corpus_stats(dl)
    return docs, postings, dl, stats_df, stats


def test_boolean_must_gates_and_scores(spark, tiny):
    """must terms both gate candidacy AND contribute to the score;
    docs missing any must term are absent even when should terms hit."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import boolean_topk

    docs, postings, dl, stats_df, stats = tiny
    rows = [("x", "alpha", "must"), ("x", "beta", "must"),
            ("x", "gamma", "should")]
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in boolean_topk(
            rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 10
        ).collect()
    }
    # docs with BOTH alpha and beta: 0 and 2 only
    assert set(got) == {0, 2}
    exp = _brute_bm25(["alpha", "beta", "gamma"], BM25_K1, BM25_B)
    for d in got:
        assert got[d][1] == pytest.approx(exp[d], abs=1e-6)
    # rank follows score desc
    order = sorted(got.items(), key=lambda kv: kv[1][0])
    scores = [s for _, (_r, s) in order]
    assert scores == sorted(scores, reverse=True)


def test_boolean_must_not_excludes_and_does_not_score(spark, tiny):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import boolean_topk

    docs, postings, dl, stats_df, stats = tiny
    rows = [("x", "alpha", "must"), ("x", "beta", "must_not")]
    got = {r["doc_id"]: r["score"] for r in boolean_topk(
        rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 10
    ).collect()}
    # alpha docs: 0,1,2; beta excludes 0 and 2
    assert set(got) == {1}
    exp = _brute_bm25(["alpha"], BM25_K1, BM25_B)
    assert got[1] == pytest.approx(exp[1], abs=1e-6)


def test_boolean_pure_or_and_missing_must(spark, tiny):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import boolean_topk

    docs, postings, dl, stats_df, stats = tiny
    rows = [
        ("or", "beta", "should"), ("or", "gamma", "should"),
        ("none", "zzzmissing", "must"), ("none", "alpha", "should"),
    ]
    out = boolean_topk(
        rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 10
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    # OR query: any beta or gamma doc
    assert by_q.get("or") == {0, 2}
    # a must term with zero postings can never be satisfied
    assert "none" not in by_q


def test_phrase_counts_overlapping_and_requires_adjacency(spark, tiny):
    from flame_spark.searchops import phrase_topk

    docs, *_ = tiny
    phrases = [
        ("p0", ["alpha", "beta"]),     # doc0: starts 0 and 2 -> tf 2
        ("p1", ["delta", "delta"]),    # doc3 has 4 deltas -> tf 3 (overlap)
        ("p2", ["beta", "beta"]),      # doc0: only start 3 -> tf 1
        ("p3", ["gamma", "beta"]),     # co-occur in doc2 but NOT adjacent
    ]
    got = {}
    for r in phrase_topk(
        phrases, docs.select("doc_id", "tokens"), 10
    ).collect():
        got[(r["query_id"], r["doc_id"])] = (r["rank"], r["phrase_tf"])
    assert got[("p0", 0)][1] == 2
    assert ("p0", 2) not in got       # beta gamma alpha: not adjacent
    assert got[("p1", 3)][1] == 3     # overlapping repeats all count
    assert got[("p2", 0)][1] == 1
    assert all(q != "p3" for q, _ in got)  # order matters: gamma->beta absent


def test_prefix_suggest_ranking_and_mixed_lengths(spark, tiny):
    from flame_spark.searchops import prefix_suggest

    _docs, _postings, _dl, stats_df, _stats = tiny
    out = prefix_suggest(["a", "de", "b", "zz"], stats_df, 10).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r["prefix"], []).append((r["rank"], r["term"], r["df"]))
    assert [t for _, t, _ in sorted(by_p["a"])] == ["alpha"]
    assert by_p["a"][0][2] == 3       # alpha in docs 0,1,2
    assert [t for _, t, _ in sorted(by_p["de"])] == ["delta"]
    assert [t for _, t, _ in sorted(by_p["b"])] == ["beta"]
    assert "zz" not in by_p


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_search_plans_no_quadratic_joins(spark):
    """All three search gates must stay hash-join / broadcast shaped —
    no CartesianProduct, no BroadcastNestedLoopJoin (prefix matching
    is an equi-join on substring(term, 1, L), not a theta-join scan)."""
    from flame_spark.queries import QUERIES

    for name in (
        "search_boolean_topk",
        "search_phrase_topk",
        "search_prefix_suggest",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        if name != "search_boolean_topk":
            # zero Python on the row path (boolean inherits score_bm25's
            # Arrow-vectorized np_log idf UDF — same as j6_bm25_topk)
            assert "EvalPython" not in plan, name


def test_phrase_single_explicit_exchange_feeds_both_aggs(spark, tiny):
    """The one explicit repartition on (query_id, doc_id) must satisfy
    BOTH downstream aggregations (per-start adjacency count and the
    per-doc phrase tf): exactly two hash exchanges total — the
    explicit one plus the final window's query_id exchange."""
    from flame_spark.searchops import phrase_topk

    docs, *_ = tiny
    plan = _plan(
        phrase_topk([("p", ["alpha", "beta"])], docs.select("doc_id", "tokens"), 10)
    )
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 2, plan[:3000]
