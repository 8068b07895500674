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
        "search_fuzzy_expand",
        "search_fuzzy_topk",
        "search_bm25f_roles",
        "search_snippets",
        "search_more_like_this",
        "text_collocations",
    ):
        plan = _plan(QUERIES[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name
        if name in (
            "search_phrase_topk", "search_prefix_suggest",
            "search_fuzzy_expand",
        ):
            # zero Python on the row path; the scoring gates inherit the
            # Arrow-vectorized np_log idf UDF — same as j6_bm25_topk
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


# ---------------------------------------------------------------------------
# fuzzy search (fuzzy_expand / fuzzy_topk)
# ---------------------------------------------------------------------------


def _lev(a, b):
    """Independent plain-Levenshtein (unit costs, no transposition)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            ))
        prev = cur
    return prev[-1]


def test_fuzzy_expand_matches_bruteforce(spark):
    """Deletion-neighborhood join == brute-force levenshtein<=1 over a
    vocab with the adversarial cases: transposition pairs share a
    deletion variant at distance 2 (must be filtered), double-deletion
    duplicates ("scann"->"scan" twice), single-char terms whose
    neighborhood contains the empty string, and exact matches."""
    from pyspark.sql import functions as F

    from flame_spark.searchops import fuzzy_expand

    vocab = ["ab", "ba", "scan", "scann", "a", "b", "alpha", "alpine",
             "table", "stable"]
    stats_df = spark.createDataFrame(
        [(t, i + 1, i + 1) for i, t in enumerate(vocab)],
        "term string, df long, cf long",
    )
    queries = [("q0", "ab"), ("q1", "scan"), ("q2", "a"), ("q3", "tble"),
               ("q4", "alpha"), ("q5", "zzz")]
    got = {
        (r["query_id"], r["qterm"], r["term"], r["dist"], r["df"])
        for r in fuzzy_expand(queries, stats_df).collect()
    }
    exp = {
        (qid, qt, t, _lev(qt, t), i + 1)
        for qid, qt in queries
        for i, t in enumerate(vocab)
        if _lev(qt, t) <= 1
    }
    assert got == exp
    # the adversarial specifics actually bit: transposition excluded...
    assert not any(q == "q0" and t == "ba" for q, _, t, _, _ in got)
    # ...single deletion/insertion and exact matches present
    assert ("q1", "scan", "scann", 1, 4) in got
    assert ("q1", "scan", "scan", 0, 3) in got
    assert ("q2", "a", "b", 1, 6) in got       # via shared "" variant
    assert ("q3", "tble", "table", 1, 9) in got
    # no expansion at all for q5
    assert not any(q == "q5" for q, _, t, _, _ in got)


def test_fuzzy_expand_contract_errors(spark):
    from flame_spark.searchops import fuzzy_expand

    stats_df = spark.createDataFrame(
        [("a", 1, 1)], "term string, df long, cf long"
    )
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_expand([("q", "a")], stats_df, max_dist=2)
    with pytest.raises(ValueError, match="duplicate"):
        fuzzy_expand([("q", "a"), ("q", "a")], stats_df)


def test_fuzzy_topk_equals_bm25_on_expanded_set(spark, tiny):
    """fuzzy score == plain BM25 over the DISTINCT expanded vocab set
    (qtf=1), including a query term that expands to TWO vocab terms."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import fuzzy_topk

    docs, postings, dl, stats_df, stats = tiny
    # "bta" -> beta (1 del); "gama" -> gamma (1 ins); "alpa" -> alpha
    rows = [("f", "bta"), ("f", "gama"), ("f", "alpa"), ("zero", "qqqq")]
    got = {r["doc_id"]: r["score"] for r in fuzzy_topk(
        rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 10
    ).collect() if r["query_id"] == "f"}
    exp = _brute_bm25(["beta", "gamma", "alpha"], BM25_K1, BM25_B)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-6)


def test_fuzzy_topk_zero_expansion_returns_no_rows(spark, tiny):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import fuzzy_topk

    _docs, postings, dl, stats_df, stats = tiny
    out = fuzzy_topk(
        [("z", "qqqq")], postings, dl, stats_df, stats, BM25_K1, BM25_B, 10
    ).collect()
    assert out == []


# ---------------------------------------------------------------------------
# BM25F (role-weighted conversation ranking)
# ---------------------------------------------------------------------------

TURNS = [
    ("c0", "user", ["alpha", "beta"]),
    ("c0", "assistant", ["alpha", "alpha"]),
    ("c1", "user", ["beta", "gamma", "beta"]),
    ("c1", "assistant", ["delta"]),
    ("c2", "user", []),            # zero-token conv still counts in N/avgdl
    ("c3", "assistant", ["alpha"]),
]


def _brute_bm25f(qterms, weights, k1, b):
    """Independent BM25F over TURNS: weighted tf/dl, conv-level df."""
    convs = sorted({c for c, _r, _t in TURNS})
    wtf, dl = {}, {c: 0.0 for c in convs}
    for c, r, toks in TURNS:
        w = weights[r]
        dl[c] += w * len(toks)
        for t in toks:
            wtf[(c, t)] = wtf.get((c, t), 0.0) + w
    n = len(convs)
    avgdl = sum(dl.values()) / n
    df = {}
    for (c, t) in wtf:
        df[t] = df.get(t, 0) + 1
    out = {}
    for c in convs:
        s, hit = 0.0, False
        for t, qtf in qterms:
            v = wtf.get((c, t), 0.0)
            if not v:
                continue
            hit = True
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += qtf * idf * (v * (k1 + 1.0)) / (
                v + k1 * (1.0 - b + b * dl[c] / avgdl)
            )
        if hit:
            out[c] = s
    return out


@pytest.fixture(scope="module")
def turn_tokens(spark):
    return spark.createDataFrame(
        TURNS, "conv_id string, role string, tokens array<string>"
    )


def test_bm25f_matches_bruteforce(spark, turn_tokens):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import bm25f_topk

    weights = {"user": 2.0, "assistant": 0.5}
    qterms = [("q", "alpha", 1), ("q", "beta", 2)]
    got = {r["conv_id"]: r["score"] for r in bm25f_topk(
        qterms, turn_tokens, weights, BM25_K1, BM25_B, 10
    ).collect()}
    exp = _brute_bm25f([("alpha", 1), ("beta", 2)], weights, BM25_K1, BM25_B)
    assert set(got) == set(exp)
    for c in got:
        assert got[c] == pytest.approx(exp[c], abs=1e-6)


def test_bm25f_uniform_weights_equals_plain_bm25(spark, turn_tokens):
    """With every role weighted 1.0, BM25F degenerates to plain BM25
    over the conversation-level token bag — field weighting is a strict
    generalization, not a different formula."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import bm25f_topk

    got = {r["conv_id"]: r["score"] for r in bm25f_topk(
        [("q", "alpha", 1)], turn_tokens, {"user": 1.0, "assistant": 1.0},
        BM25_K1, BM25_B, 10,
    ).collect()}
    exp = _brute_bm25f([("alpha", 1)], {"user": 1.0, "assistant": 1.0},
                       BM25_K1, BM25_B)
    assert set(got) == set(exp)
    for c in got:
        assert got[c] == pytest.approx(exp[c], abs=1e-6)


def test_bm25f_role_weighting_reorders(spark):
    """Two symmetric convs — the term in a heavy-weighted field must
    outrank the same term in a light field (that's the point of F)."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import bm25f_topk

    tt = spark.createDataFrame(
        [("u", "user", ["target", "pad"]), ("u", "assistant", ["pad", "x"]),
         ("a", "user", ["pad", "x"]), ("a", "assistant", ["target", "pad"])],
        "conv_id string, role string, tokens array<string>",
    )
    out = bm25f_topk(
        [("q", "target", 1)], tt, {"user": 2.0, "assistant": 0.5},
        BM25_K1, BM25_B, 10,
    ).collect()
    ranks = {r["conv_id"]: r["rank"] for r in out}
    scores = {r["conv_id"]: r["score"] for r in out}
    assert ranks["u"] == 1 and ranks["a"] == 2
    assert scores["u"] > scores["a"]


def test_bm25f_unknown_role_raises(spark):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import bm25f_topk

    tt = spark.createDataFrame(
        [("c", "tool", ["alpha"])],
        "conv_id string, role string, tokens array<string>",
    )
    with pytest.raises(Exception, match="no weight for role"):
        bm25f_topk(
            [("q", "alpha", 1)], tt, {"user": 1.0}, 1.2, 0.75, 10
        ).collect()


# ---------------------------------------------------------------------------
# snippets
# ---------------------------------------------------------------------------


def test_snippets_first_match_window_and_clipping(spark):
    from flame_spark.searchops import snippets_for_topk

    docs_tokens = spark.createDataFrame(
        [(0, ["x", "y", "hit", "a", "b", "c", "d"]),
         (1, ["p", "q", "r", "s", "hit"]),       # hit at the tail: clipped
         (2, ["hit", "z"])],
        "doc_id long, tokens array<string>",
    )
    top = spark.createDataFrame(
        [("q", 1, 0), ("q", 2, 1), ("q", 3, 2)],
        "query_id string, rank long, doc_id long",
    )
    got = {r["doc_id"]: (r["first_pos"], r["snippet"])
           for r in snippets_for_topk(
               top, [("q", "hit"), ("q", "z")], docs_tokens, 3
           ).collect()}
    assert got[0] == (2, "hit a b")
    assert got[1] == (4, "hit")               # window clipped at doc end
    assert got[2] == (0, "hit z")             # earliest of the two hits


# ---------------------------------------------------------------------------
# more-like-this
# ---------------------------------------------------------------------------


def test_more_like_this_selection_and_scoring(spark, tiny):
    """Seed 0 ("alpha beta alpha beta beta"): selection by (tf desc,
    df asc, term asc) picks beta(3) then alpha(2); results equal plain
    BM25 over {alpha, beta} minus the seed itself."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import more_like_this

    _docs, postings, dl, stats_df, stats = tiny
    out = more_like_this(
        [0], postings, dl, stats_df, stats, BM25_K1, BM25_B, 2, 10
    ).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert 0 not in got                       # seed excluded
    exp = _brute_bm25(["alpha", "beta"], BM25_K1, BM25_B)
    exp.pop(0)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-6)


def test_more_like_this_m_terms_caps_selection(spark, tiny):
    """With m_terms=1 only the top term (beta: tf 3) drives scoring —
    doc 1 (alpha only) must vanish from seed-0 results."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import more_like_this

    _docs, postings, dl, stats_df, stats = tiny
    got = {r["doc_id"] for r in more_like_this(
        [0], postings, dl, stats_df, stats, BM25_K1, BM25_B, 1, 10
    ).collect()}
    assert got == {2}  # only the other beta doc
    with pytest.raises(ValueError, match="empty seed"):
        more_like_this([], postings, dl, stats_df, stats, 1.2, 0.75, 2, 10)
