"""Ranking-family and search-analytics operators added round 5
(searchops.lm_dirichlet_topk / facet_counts / near_topk / prf_topk,
textops.keywords_per_doc): value semantics vs independent Python
brute-forces on a hand-built corpus, plus contract edges."""

import math
import re

import pytest

DOCS = [
    (0, "alpha beta alpha beta beta"),
    (1, "alpha alpha alpha"),
    (2, "beta gamma alpha"),
    (3, "delta delta delta delta"),
    (4, ""),
]


def _toks(text):
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


@pytest.fixture(scope="module")
def tiny(spark):
    from pyspark.sql import functions as F

    from flame_spark.postings import (
        build_postings, corpus_stats, doc_lengths, term_stats,
    )
    from flame_spark.textops import word_tokens_col

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    docs = docs.withColumn("tokens", word_tokens_col(F.col("text")))
    postings = build_postings(docs, "tokens")
    dl = doc_lengths(docs, "tokens")
    stats_df = term_stats(postings)
    stats = corpus_stats(dl)
    return docs, postings, dl, stats_df, stats


# ---------------------------------------------------------------------------
# LM-Dirichlet
# ---------------------------------------------------------------------------


def _brute_dirichlet(query_counts, mu):
    toks = {d: _toks(t) for d, t in DOCS}
    c_total = sum(len(v) for v in toks.values())
    cf = {}
    for tk in toks.values():
        for t in tk:
            cf[t] = cf.get(t, 0) + 1
    invocab = {t: q for t, q in query_counts.items() if t in cf}
    qlen = sum(invocab.values())
    out = {}
    for d, tk in toks.items():
        s, hit = 0.0, False
        for t, qtf in sorted(invocab.items()):
            tf = tk.count(t)
            if not tf:
                continue
            hit = True
            s += qtf * math.log(1.0 + tf / (mu * (cf[t] / c_total)))
        if hit:
            out[d] = s + qlen * math.log(mu / (len(tk) + mu))
    return out


def test_dirichlet_matches_bruteforce(spark, tiny):
    from flame_spark.searchops import lm_dirichlet_topk

    _docs, postings, dl, stats_df, _stats = tiny
    mu = 10.0  # small prior so the length normalizer actually moves ranks
    rows = [("x", "alpha", 2), ("x", "beta", 1)]
    got = {
        r["doc_id"]: r["score"]
        for r in lm_dirichlet_topk(rows, postings, dl, stats_df, mu, 10).collect()
    }
    exp = _brute_dirichlet({"alpha": 2, "beta": 1}, mu)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-6)


def test_dirichlet_oov_terms_ignored_and_candidates_sparse(spark, tiny):
    """An OOV query term contributes neither a match nor query length;
    docs matching no in-vocab term are absent (sparse candidates)."""
    from flame_spark.searchops import lm_dirichlet_topk

    _docs, postings, dl, stats_df, _stats = tiny
    mu = 10.0
    with_oov = [("x", "gamma", 1), ("x", "zzzmissing", 7)]
    without = [("y", "gamma", 1)]
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in lm_dirichlet_topk(
            with_oov + without, postings, dl, stats_df, mu, 10
        ).collect()
    }
    # gamma appears only in doc 2 -> single candidate per query
    assert set(out) == {("x", 2), ("y", 2)}
    assert out[("x", 2)] == out[("y", 2)]


def test_dirichlet_duplicate_query_term_raises(spark, tiny):
    from flame_spark.searchops import lm_dirichlet_topk

    _docs, postings, dl, stats_df, _stats = tiny
    with pytest.raises(ValueError, match="duplicate"):
        lm_dirichlet_topk(
            [("x", "alpha", 1), ("x", "alpha", 2)], postings, dl, stats_df,
            10.0, 5,
        )


# ---------------------------------------------------------------------------
# facets
# ---------------------------------------------------------------------------


def test_facet_counts_or_semantics_and_null_bucket(spark, tiny):
    from flame_spark.searchops import facet_counts

    _docs, postings, _dl, _stats_df, _stats = tiny
    meta = spark.createDataFrame(
        [(0, "en", "s0"), (1, "en", "s1"), (2, "de", "s0"),
         (3, None, "s1"), (4, "en", "s0")],
        "doc_id long, lang string, source string",
    )
    rows = [("q", "beta"), ("q", "delta"), ("solo", "gamma")]
    got = {
        (r["query_id"], r["facet"], r["value"]): r["n_docs"]
        for r in facet_counts(rows, postings, meta, ["lang", "source"]).collect()
    }
    # q matches docs {0, 2} (beta) + {3} (delta)
    assert got[("q", "lang", "en")] == 1
    assert got[("q", "lang", "de")] == 1
    assert got[("q", "lang", None)] == 1  # null metadata keeps its bucket
    assert got[("q", "source", "s0")] == 2
    assert got[("q", "source", "s1")] == 1
    # solo matches doc 2 only
    assert got[("solo", "lang", "de")] == 1
    assert got[("solo", "source", "s0")] == 1
    assert sum(n for (q, f, _v), n in got.items()
               if q == "solo" and f == "lang") == 1


def test_facet_counts_empty_fields_raises(spark, tiny):
    from flame_spark.searchops import facet_counts

    _docs, postings, _dl, _stats_df, _stats = tiny
    with pytest.raises(ValueError, match="facet"):
        facet_counts([("q", "beta")], postings, postings, [])


# ---------------------------------------------------------------------------
# proximity
# ---------------------------------------------------------------------------


def test_near_min_distance_and_window_gate(spark, tiny):
    from flame_spark.searchops import near_topk

    docs, *_ = tiny
    toks = docs.select("doc_id", "tokens")
    # doc 0: alpha@[0,2], beta@[1,3,4] -> min dist 1
    # doc 2: beta@0, alpha@2 -> min dist 2
    out1 = near_topk([("w1", "alpha", "beta", 1)], toks, 10).collect()
    assert {(r["doc_id"], r["min_dist"]) for r in out1} == {(0, 1)}
    out2 = near_topk([("w2", "alpha", "beta", 2)], toks, 10).collect()
    got = [(r["rank"], r["doc_id"], r["min_dist"]) for r in out2]
    # closest-first, doc_id tie-break
    assert sorted(got) == [(1, 0, 1), (2, 2, 2)]


def test_near_oov_term_and_contract_errors(spark, tiny):
    from flame_spark.searchops import near_topk

    docs, *_ = tiny
    toks = docs.select("doc_id", "tokens")
    assert near_topk([("q", "alpha", "zzz", 9)], toks, 10).count() == 0
    with pytest.raises(ValueError, match="term_a == term_b"):
        near_topk([("q", "alpha", "alpha", 3)], toks, 10)
    with pytest.raises(ValueError, match="duplicate"):
        near_topk(
            [("q", "alpha", "beta", 3), ("q", "beta", "gamma", 3)], toks, 10
        )


# ---------------------------------------------------------------------------
# PRF
# ---------------------------------------------------------------------------


def _brute_bm25_scores(query_counts, k1, b):
    toks = {d: _toks(t) for d, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for tk in toks.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d, tk in toks.items():
        s, hit = 0.0, False
        for t, qtf in sorted(query_counts.items()):
            tf = tk.count(t)
            if not tf or t not in df:
                continue
            hit = True
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += qtf * (idf * (tf * (k1 + 1.0))
                        / (tf + k1 * (1.0 - b + b * len(tk) / avgdl)))
        if hit:
            out[d] = s
    return out


def _brute_prf(query_counts, k1, b, fb_k, m_terms):
    toks = {d: _toks(t) for d, t in DOCS}
    df = {}
    for tk in toks.values():
        for t in set(tk):
            df[t] = df.get(t, 0) + 1
    base = _brute_bm25_scores(query_counts, k1, b)
    fb = [d for d, _s in sorted(base.items(), key=lambda kv: (-kv[1], kv[0]))][:fb_k]
    cand = {}
    for d in fb:
        for t in toks[d]:
            cand[t] = cand.get(t, 0) + 1
    cand = {t: c for t, c in cand.items() if t not in query_counts}
    sel = sorted(cand.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))[:m_terms]
    q2 = dict(query_counts)
    for t, _c in sel:
        q2[t] = 1
    return q2, _brute_bm25_scores(q2, k1, b)


def test_prf_expansion_and_rescoring_match_bruteforce(spark, tiny):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import prf_topk

    _docs, postings, dl, stats_df, stats = tiny
    rows = [("p", "gamma", 1)]
    # base: gamma hits doc 2 only -> feedback = {2}; expansion = doc 2's
    # other terms {beta, alpha} ranked by (tf desc, df asc, term asc)
    q2, exp = _brute_prf({"gamma": 1}, BM25_K1, BM25_B, fb_k=2, m_terms=2)
    assert set(q2) == {"gamma", "alpha", "beta"}
    got = {
        r["doc_id"]: r["score"]
        for r in prf_topk(
            rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 2, 2, 10
        ).collect()
    }
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-6)


def test_prf_all_oov_query_stays_empty(spark, tiny):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import prf_topk

    _docs, postings, dl, stats_df, stats = tiny
    out = prf_topk(
        [("p", "zzzmissing", 1)], postings, dl, stats_df, stats,
        BM25_K1, BM25_B, 3, 3, 10,
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# keywords
# ---------------------------------------------------------------------------


def test_keywords_selection_and_tiebreaks(spark, tiny):
    from flame_spark.textops import keywords_per_doc

    _docs, postings, _dl, stats_df, _stats = tiny
    got = {}
    for r in keywords_per_doc(postings, stats_df, 3).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for d in got:
        got[d] = [t for _rk, t in sorted(got[d])]
    # doc 0: beta tf=3 then alpha tf=2
    assert got[0] == ["beta", "alpha"]
    # doc 2: all tf=1 -> df asc breaks ties: gamma(1), beta(2), alpha(3)
    assert got[2] == ["gamma", "beta", "alpha"]
    # empty doc 4 has no postings
    assert 4 not in got


def test_keywords_m_caps_and_contract(spark, tiny):
    from flame_spark.textops import keywords_per_doc

    _docs, postings, _dl, stats_df, _stats = tiny
    one = keywords_per_doc(postings, stats_df, 1)
    assert {(r["doc_id"], r["term"]) for r in one.collect()} == {
        (0, "beta"), (1, "alpha"), (2, "gamma"), (3, "delta"),
    }
    with pytest.raises(ValueError, match="positive"):
        keywords_per_doc(postings, stats_df, 0)


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------

EMB = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.9, 0.1]),
    (4, [0.5, 0.5, 0.0]),
]


def _brute_hybrid(query_counts, qvec_id, k1, b, k_lex, k_dense, rrf_k):
    import numpy as np

    lex_scores = _brute_bm25_scores(query_counts, k1, b)
    lex_rank = {
        d: i + 1
        for i, (d, _s) in enumerate(
            sorted(lex_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k_lex]
        )
    }
    vecs = {i: np.array(v) for i, v in EMB}
    dense_rank = {}
    if qvec_id in vecs:
        qv = vecs[qvec_id]
        cos = {
            d: float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for d, v in vecs.items()
            if d != qvec_id
        }
        dense_rank = {
            d: i + 1
            for i, (d, _c) in enumerate(
                sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:k_dense]
            )
        }
    out = {}
    for d in set(lex_rank) | set(dense_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (rrf_k + lex_rank[d])
        if d in dense_rank:
            s += 1.0 / (rrf_k + dense_rank[d])
        out[d] = s
    return out


@pytest.fixture(scope="module")
def tiny_emb(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        EMB, "vec_id long, embedding array<double>"
    ).select("vec_id", F.col("embedding").alias("vec"))


def test_hybrid_rrf_matches_bruteforce(spark, tiny, tiny_emb):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import hybrid_rrf_topk

    _docs, postings, dl, stats_df, stats = tiny
    got = {
        r["doc_id"]: r["score"]
        for r in hybrid_rrf_topk(
            [("h", "alpha", 1), ("h", "beta", 1)], [("h", 0)],
            postings, dl, stats_df, stats, tiny_emb,
            BM25_K1, BM25_B, 3, 3, 60, 10,
        ).collect()
    }
    exp = _brute_hybrid({"alpha": 1, "beta": 1}, 0, BM25_K1, BM25_B, 3, 3, 60)
    assert set(got) == set(exp)
    for d in got:
        assert got[d] == pytest.approx(exp[d], abs=1e-6)
    # vec 0's nearest neighbors (1, then 4) must be present via the
    # dense branch even where the lexical branch missed them
    assert 1 in got


def test_hybrid_rrf_degrades_each_branch(spark, tiny, tiny_emb):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import hybrid_rrf_topk

    _docs, postings, dl, stats_df, stats = tiny
    out = hybrid_rrf_topk(
        # d: all-OOV text -> dense-only; l: qvec 99 absent -> lex-only
        [("d", "zzzmissing", 1), ("l", "gamma", 1)],
        [("d", 2), ("l", 99)],
        postings, dl, stats_df, stats, tiny_emb,
        BM25_K1, BM25_B, 3, 3, 60, 10,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    # dense-only: ranks purely from cosine vs vec 2 (self excluded)
    exp_d = _brute_hybrid({"zzzmissing": 1}, 2, BM25_K1, BM25_B, 3, 3, 60)
    assert by_q["d"] == {
        d: pytest.approx(s, abs=1e-6) for d, s in exp_d.items()
    }
    assert 2 not in by_q["d"]
    # lex-only: gamma appears in doc 2 only
    assert set(by_q["l"]) == {2}
    assert by_q["l"][2] == pytest.approx(1.0 / 61.0, abs=1e-6)


def test_hybrid_rrf_duplicate_qvec_raises(spark, tiny, tiny_emb):
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.searchops import hybrid_rrf_topk

    _docs, postings, dl, stats_df, stats = tiny
    with pytest.raises(ValueError, match="duplicate"):
        hybrid_rrf_topk(
            [("h", "alpha", 1)], [("h", 0), ("h", 1)],
            postings, dl, stats_df, stats, tiny_emb,
            BM25_K1, BM25_B, 3, 3, 60, 10,
        )


# ---------------------------------------------------------------------------
# segment-served Dirichlet (one stored index, two ranking families)
# ---------------------------------------------------------------------------

TERM_IDS = {"alpha": 11, "beta": 22, "gamma": 33, "delta": 44}


@pytest.fixture(scope="module")
def tiny_segments(spark, tiny):
    """Compressed segments built from the tiny corpus's word postings
    (terms mapped to stable int64 ids, the segment key type)."""
    from pyspark.sql import functions as F

    from flame_spark.segments import build_segments, postings_with_scores

    _docs, postings, dl, stats_df, stats = tiny
    idmap = F.create_map(
        *[F.lit(x) for kv in sorted(TERM_IDS.items()) for x in kv]
    )
    p_long = postings.select(
        idmap[F.col("term")].cast("long").alias("term"), "doc_id", "tf"
    )
    st_long = stats_df.select(
        idmap[F.col("term")].cast("long").alias("term"), "df", "cf"
    )
    scored = postings_with_scores(
        p_long.join(dl, "doc_id"), st_long, stats, 1.2, 0.75
    )
    seg = build_segments(scored, stats.n_docs, n_shards=2, block_size=2)
    seg = seg.persist()
    seg.count()
    return seg


def test_doc_lengths_from_segments_exact(spark, tiny, tiny_segments):
    from flame_spark.wand import doc_lengths_from_segments

    _d, _p, dl, _s, _st = tiny
    got = {r["doc_id"]: r["dl"] for r in
           doc_lengths_from_segments(tiny_segments).collect()}
    exp = {r["doc_id"]: r["dl"] for r in dl.collect() if r["dl"] > 0}
    # zero-length docs have no postings, hence no reconstructed row —
    # every doc WITH postings reconstructs its exact length
    assert got == exp


def test_segment_dirichlet_equals_relational(spark, tiny, tiny_segments):
    """The segment-served scorer must equal the relational
    lm_dirichlet_topk over the same postings (same formula, same
    candidates, scores to float tolerance — the fold orders differ
    only in term key type)."""
    from pyspark.sql import functions as F

    from flame_spark.searchops import lm_dirichlet_topk
    from flame_spark.wand import (
        dirichlet_topk_segments, doc_lengths_from_segments,
    )

    _d, postings, dl, stats_df, _st = tiny
    mu = 10.0
    qrows = [("x", "alpha", 2), ("x", "beta", 1), ("y", "gamma", 1)]
    rel = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in lm_dirichlet_topk(
            qrows, postings, dl, stats_df, mu, 10
        ).collect()
    }
    qterms = spark.createDataFrame(
        [(q, TERM_IDS[t], c) for q, t, c in qrows],
        "query_id string, term long, qtf int",
    )
    dl_df = doc_lengths_from_segments(tiny_segments)
    seg = {
        (r["query_id"], r["doc_id"]): round(r["score"], 6)
        for r in dirichlet_topk_segments(
            qterms, tiny_segments, dl_df, mu, 10
        ).collect()
    }
    assert set(seg) == set(rel)
    for key in seg:
        assert seg[key] == pytest.approx(rel[key], abs=1e-9)


def test_segment_dirichlet_oov_and_empty_contract(spark, tiny, tiny_segments):
    from flame_spark.wand import (
        dirichlet_topk_segments, doc_lengths_from_segments,
    )

    qterms = spark.createDataFrame(
        [("q", 999999, 1)], "query_id string, term long, qtf int"
    )
    dl_df = doc_lengths_from_segments(tiny_segments)
    assert dirichlet_topk_segments(
        qterms, tiny_segments, dl_df, 10.0, 5
    ).count() == 0
    empty_dl = dl_df.where("doc_id < 0")
    with pytest.raises(ValueError, match="empty index"):
        dirichlet_topk_segments(qterms, tiny_segments, empty_dl, 10.0, 5)


def test_segment_dirichlet_batch_equals_singletons(spark, tiny, tiny_segments):
    """Regression: a multi-query batch whose queries SHARE a term must
    score each query exactly as if it ran alone — cf comes from the
    distinct query terms' segment rows, not the per-query joined rows
    (which would count a shared term once per query and inflate cf)."""
    from flame_spark.wand import (
        dirichlet_topk_segments, doc_lengths_from_segments,
    )

    mu = 10.0
    dl_df = doc_lengths_from_segments(tiny_segments)
    batch_rows = [
        ("x", TERM_IDS["alpha"], 1), ("x", TERM_IDS["beta"], 1),
        ("y", TERM_IDS["alpha"], 2), ("y", TERM_IDS["gamma"], 1),
    ]

    def run(rows):
        q = spark.createDataFrame(
            rows, "query_id string, term long, qtf int"
        )
        return {
            (r["query_id"], r["doc_id"]): r["score"]
            for r in dirichlet_topk_segments(
                q, tiny_segments, dl_df, mu, 10
            ).collect()
        }

    batch = run(batch_rows)
    solo = {}
    for qid in ("x", "y"):
        solo.update(run([r for r in batch_rows if r[0] == qid]))
    assert batch == solo


# ---------------------------------------------------------------------------
# percolator
# ---------------------------------------------------------------------------


def test_percolate_clause_semantics(spark, tiny):
    from flame_spark.searchops import percolate

    docs, *_ = tiny
    toks = docs.select("doc_id", "tokens")
    out = percolate(
        [
            # both alpha and beta: docs 0, 2
            {"query_id": "m", "must": ["alpha", "beta"]},
            # alpha but not beta: doc 1
            {"query_id": "mn", "must": ["alpha"], "must_not": ["beta"]},
            # >= 2 of {alpha, beta, gamma}: docs 0, 2
            {"query_id": "s", "should": ["alpha", "beta", "gamma"],
             "min_should": 2},
            # no-must should defaults to min_should=1: delta docs
            {"query_id": "d", "should": ["delta"]},
            # OOV must -> no matches
            {"query_id": "z", "must": ["zzzmissing"]},
        ],
        toks,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q == {"m": {0, 2}, "mn": {1}, "s": {0, 2}, "d": {3}}


def test_percolate_contract_errors(spark, tiny):
    from flame_spark.searchops import percolate

    docs, *_ = tiny
    toks = docs.select("doc_id", "tokens")
    with pytest.raises(ValueError, match="no positive term"):
        percolate([{"query_id": "q", "must_not": ["alpha"]}], toks)
    with pytest.raises(ValueError, match="in both"):
        percolate(
            [{"query_id": "q", "must": ["alpha"], "should": ["alpha"]}], toks
        )
    # duplicate registry ids would make the combined aggregate pick an
    # arbitrary definition's n_must/min_should
    with pytest.raises(ValueError, match="duplicate query_id"):
        percolate(
            [{"query_id": "q", "must": ["alpha"]},
             {"query_id": "q", "must": ["beta", "gamma"]}], toks
        )
    # a must-less query with min_should < 1 claims matches no inverted
    # index can enumerate
    with pytest.raises(ValueError, match="min_should"):
        percolate(
            [{"query_id": "q", "should": ["alpha"], "min_should": 0}], toks
        )
    assert percolate([], toks).count() == 0


# ---------------------------------------------------------------------------
# explain
# ---------------------------------------------------------------------------


def test_explain_contributions_sum_to_served_score(spark, tiny):
    """The explain rows come from the same contributions stage
    score_bm25 folds — summing contrib per (query, doc) reproduces the
    top-k score to rounding, and tf/df match the corpus facts."""
    from flame_spark.constants import BM25_B, BM25_K1
    from flame_spark.bm25 import score_bm25, topk
    from flame_spark.searchops import explain_topk

    _docs, postings, dl, stats_df, stats = tiny
    rows = [("x", "alpha", 1), ("x", "beta", 2)]
    out = explain_topk(
        rows, postings, dl, stats_df, stats, BM25_K1, BM25_B, 3
    ).collect()
    assert out
    sums = {}
    for r in out:
        sums[(r["query_id"], r["doc_id"])] = (
            sums.get((r["query_id"], r["doc_id"]), 0.0) + r["contrib"]
        )
    qterms = spark.createDataFrame(rows, "query_id string, term string, qtf int")
    served = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in topk(
            score_bm25(
                qterms, postings.join(dl, "doc_id"), stats_df, stats,
                BM25_K1, BM25_B,
            ), 3,
        ).collect()
    }
    assert set(sums) == set(served)
    for key in sums:
        assert sums[key] == pytest.approx(served[key], abs=1e-5)
    # corpus facts: doc 0 has alpha tf=2, beta tf=3; df(alpha)=3
    facts = {(r["doc_id"], r["term"]): (r["tf"], r["df"]) for r in out}
    if (0, "alpha") in facts:
        assert facts[(0, "alpha")] == (2, 3)
