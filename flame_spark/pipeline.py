"""End-to-end orchestration: index build + BM25 query + pairwise paths.

This is SURVEY.md §3.2 as code. The uncompressed path (M0-M4) runs
everything through Catalyst-native DataFrame ops; the segment/WAND path
(M5/M6) lives in segments.py / wand.py and is verified against this
exhaustive path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .bm25 import explode_query_terms, score_bm25, topk
from .config import FlameConfig
from .corpus import (
    CorpusArtifacts,
    add_doc_id,
    add_features,
    make_bpe_tokenize_udf,
    make_lut_udf,
    make_shingle_udf,
    make_stage1_udf,
    make_ws_canon_udf,
    prepare_docs,
)
from .postings import (
    CorpusStats,
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)
from .similarity import (
    cosine_pairs_salted,
    otsu_threshold_distributed,
    similarity_score_multiset,
    tfidf_normalized,
)


@dataclass
class FlameIndex:
    """Materialized (cached) index state for a corpus."""

    cfg: FlameConfig
    artifacts: CorpusArtifacts
    docs: DataFrame  # doc_id, text, norm_text, tokens, features
    postings: DataFrame  # term, doc_id, tf
    doc_lens: DataFrame  # doc_id, dl
    stats_df: DataFrame  # term, df, cf
    stats: CorpusStats
    postings_dl: DataFrame  # term, doc_id, tf, dl (scoring-ready)


def build_index(
    raw_docs: DataFrame, cfg: FlameConfig, artifacts=None
) -> FlameIndex:
    """raw_docs(doc_id, text) -> fully prepared index state.

    One shuffle for TF, one for doc-length attach; stats are small
    aggregates. All intermediates cached because both query paths and
    the pairwise path reuse them. Pass ``artifacts`` (a persisted
    model) to index with PINNED artifacts — no learning jobs run.
    """
    # make sure the scan-side UDF stages have enough partitions to use
    # every core (input may arrive as a handful of files/partitions)
    spark = raw_docs.sparkSession
    target_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if raw_docs.rdd.getNumPartitions() < target_parts:
        raw_docs = raw_docs.repartition(target_parts)

    docs, artifacts = prepare_docs(raw_docs, cfg, artifacts)
    term_col = "features" if cfg.term_mode == "lno" else "tokens"
    if cfg.term_mode == "lno":
        docs = add_features(docs, artifacts, cfg)
    docs = docs.persist()

    postings = build_postings(docs, term_col).persist()
    doc_lens = doc_lengths(docs, term_col).persist()
    stats_df = term_stats(postings).persist()
    stats = corpus_stats(doc_lens)
    postings_dl = postings.join(doc_lens, "doc_id").persist()
    return FlameIndex(
        cfg=cfg,
        artifacts=artifacts,
        docs=docs,
        postings=postings,
        doc_lens=doc_lens,
        stats_df=stats_df,
        stats=stats,
        postings_dl=postings_dl,
    )


def query_term_rows(queries: list[dict], index) -> list[tuple]:
    """Driver-side query processing (the serving fast path).

    Queries are tiny; running the normalize/tokenize/shingle pipeline as
    Spark UDF stages costs several job round-trips per request. This
    path computes the SAME functions (normalize.py / bpe.py /
    hashing.py — the code the executors run) in-process and returns the
    (query_id, term, qtf) rows directly. Rank-identity is preserved by
    construction; the distributed path remains for bulk query sets
    (``query_terms_df``). ``index`` needs .cfg and .artifacts
    (FlameIndex or fastbuild.ServingIndex).
    """
    import numpy as np

    from .hashing import lno_gram_hashes
    from .normalize import apply_lut, canonicalize_whitespace, stage1_normalize

    cfg = index.cfg
    art = index.artifacts
    main_lut = art.norm.main_lut()
    plut = art.norm.phonetic_lut()
    rows = []
    for q in queries:
        t = canonicalize_whitespace(q["query_text"] or "")
        t = stage1_normalize(
            t, art.norm.bigram_rules if cfg.bigram_enabled else None
        )
        t = apply_lut(t, main_lut)
        if plut is not None:
            t = apply_lut(t, plut)
        if cfg.tokenizer == "bpe":
            toks = art.bpe.encode(t)
        else:
            import re

            toks = [x for x in re.split(r"[^a-z0-9]+", t) if x]
        # bounded lookup: dict when collected, filtered collect from the
        # distributed vocab otherwise (only THIS query's tokens move)
        enc = art.lookup_ids(toks)
        ids = [enc[x] for x in toks if x in enc]
        if cfg.term_mode == "lno":
            # the rolling-hash base must match the INDEX's: pinned
            # hash_base when set (extend-capable warehouses), else the
            # vocabulary size
            base = art.hash_base or art.n_vocab or len(enc)
            terms = lno_gram_hashes(
                np.array(ids, dtype=np.int64), base,
                cfg.ngram, cfg.n_out
            ).tolist()
        else:
            terms = toks
        qtf: dict = {}
        for f in terms:
            qtf[f] = qtf.get(f, 0) + 1
        rows.extend((q["query_id"], f, int(c)) for f, c in qtf.items())
    return rows


def query_terms_local(
    spark: SparkSession, queries: list[dict], index
) -> DataFrame:
    """``query_term_rows`` shipped as a DataFrame for the distributed
    scorers."""
    rows = query_term_rows(queries, index)
    term_type = "long" if index.cfg.term_mode == "lno" else "string"
    return spark.createDataFrame(
        rows, f"query_id string, term {term_type}, qtf int"
    )


def query_terms_df(
    spark: SparkSession, queries: list[dict], index: FlameIndex
) -> DataFrame:
    """Run the SAME normalize/tokenize/shingle pipeline over query texts
    (SURVEY §3.2 q1) using the broadcast index artifacts."""
    cfg = index.cfg
    art = index.artifacts
    qdf = spark.createDataFrame(
        [(q["query_id"], q["query_text"]) for q in queries],
        "query_id string, query_text string",
    )
    sc = spark.sparkContext
    ws = make_ws_canon_udf()
    stage1 = make_stage1_udf(art.norm.bigram_rules if cfg.bigram_enabled else None)
    qdf = qdf.withColumn("t", stage1(ws(F.col("query_text"))))
    lut_bc = sc.broadcast(art.norm.main_lut())
    qdf = qdf.withColumn("t", make_lut_udf(lut_bc)(F.col("t")))
    plut = art.norm.phonetic_lut()
    if plut is not None:
        qdf = qdf.withColumn(
            "t", make_lut_udf(sc.broadcast(plut))(F.col("t"))
        )
    if cfg.tokenizer == "bpe":
        model_bc = sc.broadcast(art.bpe)
        qdf = qdf.withColumn("tokens", make_bpe_tokenize_udf(model_bc)(F.col("t")))
    else:
        qdf = qdf.withColumn(
            "tokens",
            F.filter(F.split(F.col("t"), "[^a-z0-9]+"), lambda x: x != ""),
        )
    if cfg.term_mode == "lno":
        if art.encoder is not None:
            encoder_bc = sc.broadcast(art.encoder)
            shingle = make_shingle_udf(
                encoder_bc, cfg.ngram, cfg.n_out,
                base=art.hash_base or None,
            )
            qdf = qdf.withColumn("terms", shingle(F.col("tokens")))
        else:
            # distributed-vocab mode: join-encode the query tokens, then
            # hash the id arrays (vocab never leaves the cluster)
            from .corpus import encode_tokens_joined, make_shingle_from_ids_udf

            qdf = qdf.withColumnRenamed("query_id", "doc_id")
            qdf = encode_tokens_joined(qdf, art.encoder_df)
            shingle_ids = make_shingle_from_ids_udf(
                art.hash_base or art.n_vocab, cfg.ngram, cfg.n_out
            )
            qdf = qdf.withColumn("terms", shingle_ids(F.col("token_ids")))
            qdf = qdf.withColumnRenamed("doc_id", "query_id")
    else:
        qdf = qdf.withColumn("terms", F.col("tokens"))
    return qdf.select("query_id", "terms")


def bm25_topk(
    spark: SparkSession, queries: list[dict], index: FlameIndex, k: int = 10,
    local_query_pipeline: bool = True,
) -> DataFrame:
    """Exhaustive (uncompressed) BM25 top-k — the rank-identity baseline."""
    if local_query_pipeline:
        qterms = query_terms_local(spark, queries, index)
    else:
        qterms = explode_query_terms(query_terms_df(spark, queries, index))
    scored = score_bm25(
        qterms,
        index.postings_dl,
        index.stats_df,
        index.stats,
        index.cfg.bm25_k1,
        index.cfg.bm25_b,
    )
    return topk(scored, k)


def build_segment_table(index: FlameIndex) -> DataFrame:
    """Compressed block-max segment table (M5) for the WAND path."""
    from .segments import build_segments, postings_with_scores

    scored = postings_with_scores(
        index.postings_dl,
        index.stats_df,
        index.stats,
        index.cfg.bm25_k1,
        index.cfg.bm25_b,
    )
    return build_segments(
        scored, index.stats.n_docs, index.cfg.n_shards, index.cfg.block_size
    )


def wand_bm25_topk(
    spark: SparkSession,
    queries: list[dict],
    index: FlameIndex,
    segments: DataFrame,
    k: int = 10,
    exclude_docs=None,
) -> DataFrame:
    """Block-max WAND top-k over segments (M6) — identical results to
    ``bm25_topk`` by construction (verified by tests). ``exclude_docs``
    suppresses tombstoned docs at serve time (live-docs semantics, see
    wand.wand_topk)."""
    from .wand import wand_topk

    qterms = query_terms_local(spark, queries, index)
    return wand_topk(
        qterms, segments, k, index.cfg.block_size, exclude_docs
    )


def boolean_clause_rows(bool_queries: list[dict], index) -> list[tuple]:
    """Driver-side clause processing shared by the distributed and the
    serving boolean paths: each clause text runs through the SAME
    query pipeline as a free-text query (query_term_rows), a feature
    landing in two clauses of one query is refused loudly, and n_must
    (the query's distinct must-feature count) is carried on every row.
    -> [(query_id, term, qtf, clause, n_must), ...]."""
    rows: list[tuple] = []
    for q in bool_queries:
        qid = q["query_id"]
        per_clause: dict[str, list[tuple]] = {}
        for clause in ("must", "should", "must_not"):
            text = q.get(clause) or ""
            if not text:
                continue
            per_clause[clause] = query_term_rows(
                [{"query_id": qid, "query_text": text}], index
            )
        seen: dict = {}
        n_must = len({t for (_q, t, _c) in per_clause.get("must", ())})
        for clause, crows in per_clause.items():
            for _qid, term, qtf in crows:
                if term in seen:
                    raise ValueError(
                        f"boolean query {qid!r}: term {term} "
                        f"appears in both {seen[term]!r} and {clause!r}"
                    )
                seen[term] = clause
                rows.append((qid, term, int(qtf), clause, n_must))
    return rows


def wand_boolean_topk(
    spark: SparkSession,
    bool_queries: list[dict],
    index,
    segments: DataFrame,
    k: int = 10,
    exclude_docs=None,
) -> DataFrame:
    """Boolean (must / should / must_not) BM25 top-k over segments.

    bool_queries: [{"query_id": ..., "must": text, "should": text,
    "must_not": text}] — each clause text runs through the SAME
    normalize/tokenize/shingle pipeline as a free-text query
    (query_term_rows), so in ``lno`` term mode a clause contributes
    its n-gram FEATURES: must = docs containing every feature of the
    must text, must_not = docs containing none of that text's
    features, scoring over must+should features with the stored
    per-posting scores. A feature landing in two clauses of one query
    is a semantic contradiction — refused loudly (choose clause texts
    with disjoint vocabulary). A clause shorter than the n-gram window
    yields zero features and is a no-op (a featureless must degrades
    to pure-OR over should, exactly like an empty must clause).
    -> (query_id, rank, doc_id, score)."""
    from .wand import wand_boolean

    rows = boolean_clause_rows(bool_queries, index)
    term_type = "long" if index.cfg.term_mode == "lno" else "string"
    qclauses = spark.createDataFrame(
        rows,
        f"query_id string, term {term_type}, qtf int, clause string, "
        "n_must int",
    )
    return wand_boolean(
        qclauses, segments, k, index.cfg.block_size, exclude_docs
    )


def wand_boolean_serve_batch(
    bool_queries: list[dict],
    index,
    segments_sharded: DataFrame,
    k: int = 10,
    exclude_docs=None,
) -> list[tuple]:
    """Batched boolean serving over the shard-partitioned segment
    cache: driver-side clause pipeline (boolean_clause_rows) + ONE
    Spark job for the whole query set (wand.wand_boolean_serve_batch).
    Identical results to ``wand_boolean_topk`` (tested). Returns
    [(query_id, rank, doc_id, score), ...]."""
    from .wand import wand_boolean_serve_batch as _serve

    rows = boolean_clause_rows(bool_queries, index)
    by_q: dict = {}
    nm: dict = {}
    for qid, term, qtf, clause, n_must in rows:
        by_q.setdefault(qid, []).append((term, qtf, clause))
        nm[qid] = n_must
    queries_clauses = [
        (q["query_id"], nm.get(q["query_id"], 0), by_q.get(q["query_id"], []))
        for q in bool_queries
    ]
    return _serve(
        queries_clauses, segments_sharded, k, index.cfg.block_size,
        exclude_docs,
    )


def wand_bm25_serve(
    queries: list[dict],
    index,
    segments_sharded: DataFrame,
    k: int = 10,
    exclude_docs=None,
) -> list[tuple]:
    """Low-latency serving top-k: driver-side query pipeline + ONE
    Spark stage per query over the shard-partitioned segment cache
    (wand.wand_topk_serve) + driver merge. Identical results to
    ``wand_bm25_topk`` (tested). ``index`` is a FlameIndex or
    fastbuild.ServingIndex; ``segments_sharded`` comes from
    wand.segments_for_serving. Returns
    [(query_id, rank, doc_id, score), ...]."""
    from .wand import _normalize_exclude, wand_topk_serve

    # normalize ONCE per batch (a generator would be exhausted by the
    # first query; a large tombstone array would re-sort per query on
    # the latency path) — the per-query calls then see an already-
    # canonical array and np.unique on it is cheap
    exclude_docs = _normalize_exclude(exclude_docs)
    rows = query_term_rows(queries, index)
    out: list[tuple] = []
    for q in queries:
        qid = q["query_id"]
        qrows = [(t, c) for rqid, t, c in rows if rqid == qid]
        res = wand_topk_serve(
            qrows, segments_sharded, k, index.cfg.block_size, exclude_docs
        )
        out.extend((qid, r, d, s) for r, d, s in res)
    return out


def wand_bm25_serve_batch(
    queries: list[dict],
    index,
    segments_sharded: DataFrame,
    k: int = 10,
    exclude_docs=None,
) -> list[tuple]:
    """Throughput serving: ALL queries scored in ONE Spark job over the
    shard-partitioned segment cache (wand.wand_topk_serve_batch — the
    union of query terms is one scan filter, each matching posting list
    is decoded once and shared across queries). Result-identical to
    ``wand_bm25_serve`` (tested); use that path for single-query
    latency, this one when queries arrive faster than the per-job
    scheduling rate."""
    from .wand import wand_topk_serve_batch

    rows = query_term_rows(queries, index)
    per_q: dict[str, list[tuple]] = {}
    for qid, t, c in rows:
        per_q.setdefault(qid, []).append((t, c))
    qlist = [(q["query_id"], per_q.get(q["query_id"], [])) for q in queries]
    return wand_topk_serve_batch(
        qlist, segments_sharded, k, index.cfg.block_size, exclude_docs
    )


def dirichlet_topk_serve(
    spark: SparkSession,
    queries: list[dict],
    index,
    segments_sharded: DataFrame,
    dl_df: DataFrame,
    k: int = 10,
    mu: float = 2000.0,
    exclude_docs=None,
    c_total: float | None = None,
) -> list[tuple]:
    """Second-family serving: LM-Dirichlet top-k over the
    shard-partitioned segment cache — the score is recomputed from the
    stored tf streams (wand.dirichlet_topk_segments), so the SAME
    cached index serves both ranking families. ``dl_df`` is the
    (doc_id, dl) table reconstructed once per snapshot by
    wand.doc_lengths_from_segments. All queries score in one
    distributed job. Returns [(query_id, rank, doc_id, score), ...]."""
    from .wand import dirichlet_topk_segments_rows

    # the query pipeline runs on the driver; hand the rows straight to
    # the rows-based scorer instead of round-tripping them through a
    # createDataFrame + collect per batch
    qrows = query_term_rows(queries, index)
    out = dirichlet_topk_segments_rows(
        qrows, segments_sharded, dl_df, mu, k, exclude_docs, c_total
    )
    return [
        (r["query_id"], r["rank"], r["doc_id"], r["score"])
        for r in out.collect()
    ]


def pairwise_similarity(index: FlameIndex) -> DataFrame:
    """FLAME dist_mat parity: (doc_i, doc_j, score), i<j, nonzero.

    Uses the skew-salted self-join by default (auto df cutoff from the
    index's term stats) — bit-identical to the plain ``cosine_pairs``
    join, but one Zipf-hot formulaic n-gram can no longer pin an entire
    posting list's pair work on a single reducer."""
    weights = tfidf_normalized(index.postings, index.stats_df, index.stats.n_docs)
    return cosine_pairs_salted(weights, index.stats_df)


def auto_threshold(index: FlameIndex, pairs: DataFrame) -> float:
    """Otsu over the nonzero dist_mat multiset (flame.py:689-701)."""
    n_nonzero = index.doc_lens.filter(F.col("dl") > 0).count()
    scores = similarity_score_multiset(pairs, n_nonzero)
    return otsu_threshold_distributed(scores)
