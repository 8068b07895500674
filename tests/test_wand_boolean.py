"""Boolean retrieval over segments (wand.wand_boolean): kernel
semantics vs a driver-side brute force over the decoded postings, the
should-only == plain-WAND identity, and the loud contradiction check."""

import numpy as np
import pytest

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import transcripts_df
from flame_spark.pipeline import (
    build_index,
    build_segment_table,
    query_term_rows,
    wand_bm25_topk,
    wand_boolean_topk,
)

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=80, tokenizer="word",
    term_mode="lno", n_shards=5, block_size=4,
)

# clause vocabularies are disjoint WITHIN each query (word tokenizer ->
# disjoint tokens -> disjoint LNO features)
BOOLQ = [
    # must_not drawn from the SAME formula's continuation, so it
    # provably intersects the must candidates (asserted below)
    {"query_id": "b0", "must": "in nomine sancte",
     "should": "notum sit omnibus tam", "must_not": "individue trinitatis amen"},
    {"query_id": "b1", "must": "",
     "should": "ad perpetuam rei memoriam", "must_not": "universis presentes litteras"},
    {"query_id": "b2", "must": "testibus presentibus et ad",
     "should": "", "must_not": ""},
]


@pytest.fixture(scope="module")
def built(spark):
    tdf = add_doc_id(transcripts_df(spark, 8, 7), ["conv_id", "turn_idx"])
    index = build_index(tdf.select("doc_id", "text"), CFG)
    segments = build_segment_table(index).persist()
    return index, segments


@pytest.fixture(scope="module")
def postings(built):
    """Driver-side decode of EVERY segment row: term -> {doc: score}."""
    from flame_spark.segments import decode_segment_row

    _index, segments = built
    post: dict = {}
    for row in segments.collect():
        docs, _tfs, scores = decode_segment_row(row)
        d = post.setdefault(row["term"], {})
        for doc, s in zip(docs.tolist(), scores.tolist()):
            d[doc] = s
    return post


def _brute(qdefs, post, k):
    """Independent exhaustive boolean BM25 over the decoded postings.
    qdefs: [(term, qtf, clause)]. Fold order = ascending term, the
    engine's deterministic order, so scores must be bit-identical."""
    must_terms = [t for t, _, c in qdefs if c == "must"]
    pos = sorted((t, q) for t, q, c in qdefs if c != "must_not")
    neg_terms = [t for t, _, c in qdefs if c == "must_not"]
    if must_terms:
        sets = [set(post.get(t, {})) for t in must_terms]
        cand = set.intersection(*sets)
    elif pos:
        cand = set().union(*[set(post.get(t, {})) for t, _ in pos])
    else:
        cand = set()
    for t in neg_terms:
        cand -= set(post.get(t, {}))
    scores = {}
    for d in cand:
        s = 0.0
        for t, q in pos:
            if d in post.get(t, {}):
                s += float(q) * post[t][d]
        scores[d] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {r + 1: (d, s) for r, (d, s) in enumerate(top)}


def _qdefs(index, q):
    out = []
    for clause in ("must", "should", "must_not"):
        text = q.get(clause) or ""
        if text:
            rows = query_term_rows(
                [{"query_id": q["query_id"], "query_text": text}], index
            )
            out.extend((t, qtf, clause) for _qid, t, qtf in rows)
    return out


def test_boolean_equals_bruteforce_bit_identical(spark, built, postings):
    index, segments = built
    got = {}
    for r in wand_boolean_topk(
        spark, BOOLQ, index, segments, k=10
    ).collect():
        got.setdefault(r["query_id"], {})[r["rank"]] = (
            r["doc_id"], r["score"],
        )
    any_rows = False
    for q in BOOLQ:
        exp = _brute(_qdefs(index, q), postings, k=10)
        assert got.get(q["query_id"], {}) == exp, q["query_id"]
        any_rows = any_rows or bool(exp)
    assert any_rows, "fixture queries must produce at least one result"
    # the must_not clause actually bit somewhere: b0 without it differs
    b0 = dict(BOOLQ[0])
    b0["must_not"] = ""
    exp_nofilter = _brute(_qdefs(index, b0), postings, k=10)
    assert exp_nofilter != _brute(_qdefs(index, BOOLQ[0]), postings, k=10)


def test_should_only_equals_plain_wand(spark, built):
    """A boolean query with ONLY a should clause is plain BM25 top-k:
    same candidates (union), same scores — must equal wand_bm25_topk
    on the same text, rank for rank, bit for bit."""
    index, segments = built
    text = "notum sit omnibus tam presentibus"
    plain = {
        (r["rank"], r["doc_id"], r["score"])
        for r in wand_bm25_topk(
            spark, [{"query_id": "q", "query_text": text}], index, segments,
            k=10,
        ).collect()
    }
    boolean = {
        (r["rank"], r["doc_id"], r["score"])
        for r in wand_boolean_topk(
            spark, [{"query_id": "q", "should": text}], index, segments,
            k=10,
        ).collect()
    }
    assert plain == boolean and plain


def test_unsatisfiable_must_returns_empty(spark, built, postings):
    """A must clause with real features that exist in no document can
    match nothing (covers the n_must short-circuit: the segment join
    drops absent terms, so shards see fewer must rows than n_must).
    The words are in-vocabulary but the SEQUENCE (last word of one
    formula, first words of two others) occurs in no document — LNO
    features are order-sensitive. An OOV must text would instead yield
    ZERO features and degrade to pure-OR (the documented featureless-
    clause contract), which is exactly what must NOT happen here."""
    index, segments = built
    q = {"query_id": "q", "must": "amen notum ego",
         "should": "notum sit omnibus"}
    qdefs = _qdefs(index, q)
    must_terms = [t for t, _, c in qdefs if c == "must"]
    assert must_terms, "must text must produce features for this test"
    assert any(t not in postings for t in must_terms)
    out = wand_boolean_topk(spark, [q], index, segments, k=10).collect()
    assert out == []


def test_serve_batch_equals_distributed(spark, built):
    """The batched serving path must be tuple-identical to the
    distributed wand_boolean — same kernel, same fold, same tie-break
    — including under a serve-time exclude set."""
    from flame_spark.pipeline import wand_boolean_serve_batch
    from flame_spark.wand import segments_for_serving

    index, segments = built
    cache = segments_for_serving(segments, 4)
    try:
        dist = {
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in wand_boolean_topk(
                spark, BOOLQ, index, segments, k=10
            ).collect()
        }
        served = set(
            wand_boolean_serve_batch(BOOLQ, index, cache, k=10)
        )
        assert served == dist and served
        # exclude the top doc of b2 (a query with results — b0's
        # must_not empties it): both paths must agree again
        top_doc = min(d for q, r, d, s in dist if q == "b2" and r == 1)
        dist_x = {
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in wand_boolean_topk(
                spark, BOOLQ, index, segments, k=10,
                exclude_docs=[top_doc],
            ).collect()
        }
        served_x = set(
            wand_boolean_serve_batch(
                BOOLQ, index, cache, k=10, exclude_docs=[top_doc]
            )
        )
        assert served_x == dist_x
        assert all(d != top_doc for _q, _r, d, _s in served_x)
        assert served_x != served
    finally:
        cache.unpersist()


def test_cross_clause_duplicate_feature_raises(spark, built):
    index, segments = built
    with pytest.raises(ValueError, match="appears in both"):
        wand_boolean_topk(
            spark,
            [{"query_id": "q", "must": "in nomine sancte",
              "should": "in nomine sancte"}],
            index, segments, k=10,
        )
