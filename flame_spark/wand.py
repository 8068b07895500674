"""Block-max WAND top-k scoring over compressed segments (F8).

Query plan (SURVEY §3.2 q2-q4):

  q2  query terms (tiny, with qtf + idf precomputed at index build) are
      broadcast-joined to the segment table on ``term`` — parquet
      min/max stats on the sorted ``term`` column prune segment files;
  q3  per (query_id, shard) an ``applyInPandas`` scorer decodes the
      varbyte postings and runs vectorized block-max WAND: candidate
      docs are ranked by their block-level score upper bound
      UB(d) = sum_t qtf_t * block_max_t[block(d)] and evaluated
      exactly in UB-descending chunks until UB < theta (the running
      k-th best exact score) — every skipped doc provably cannot enter
      the top-k, so results are IDENTICAL to exhaustive scoring;
  q4  global top-k: shards emit their local top-k (a doc lives in
      exactly one doc-range shard), one window row_number <= k with the
      deterministic (score desc, doc_id asc) tie-break.

Bit-exactness: exact evaluation accumulates per-term contributions in
ascending-term order — the same fixed fold order as the exhaustive
path and the oracle — and uses the stored float64 scores the
exhaustive path computed, so scores are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .segments import varbyte_decode

#: batch-serve scan filter: at or below this many distinct terms the
#: query-term set is pushed as a literal In filter (cached-batch
#: min/max pruning applies); above it, a broadcast semi-join (a
#: 100k-literal In expression is a Catalyst analysis/codegen tax).
TERM_FILTER_CUTOFF = 1024


def wand_topk_per_shard(
    qseg: DataFrame, k: int, block_size: int, exclude_bc=None
) -> DataFrame:
    """qseg: (query_id, shard, term, qtf, n_docs, first_doc, last_doc,
    doc_deltas, scores, block_max) -> per-shard top-k
    (query_id, doc_id, score). ``exclude_bc``: optional broadcast of a
    sorted int64 doc-id array to suppress (see _wand_shard_kernel)."""

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = pdf["query_id"].iloc[0]
        excl = exclude_bc.value if exclude_bc is not None else None
        top_docs, top_scores = _wand_shard_kernel(pdf, k, block_size, excl)
        return pd.DataFrame(
            {
                "query_id": query_id,
                "doc_id": top_docs.astype(np.int64),
                "score": top_scores,
            }
        )

    return qseg.groupBy("query_id", "shard").applyInPandas(
        score_group, schema="query_id string, doc_id long, score double"
    )


def _normalize_exclude(exclude_docs) -> np.ndarray | None:
    """Canonical serve-time exclude set: sorted unique int64 array, or
    None when empty — ONE implementation shared by every scoring path
    so the 'tuple-identical results' contract can't drift."""
    if exclude_docs is None:
        return None
    arr = (
        exclude_docs
        if isinstance(exclude_docs, np.ndarray)
        else np.asarray(list(exclude_docs), dtype=np.int64)
    )
    arr = np.unique(arr.astype(np.int64, copy=False))
    return arr if arr.size else None


def _decode_posting(doc_deltas, score_bytes, block_max, block_size: int):
    """One segment row's raw column values -> (docs, scores,
    block_first_docs, block_max), the kernel's per-term working
    arrays. Takes the columns directly (not a pandas row) so callers
    iterate with zip over .values instead of iterrows — iterrows
    builds a Series per row, pure overhead on the serve hot path.
    Split out so the batch serving path decodes each (shard, term)
    ONCE and reuses it across every query in the batch."""
    deltas = varbyte_decode(bytes(doc_deltas)).astype(np.int64)
    docs = np.cumsum(deltas)
    scores = np.frombuffer(bytes(score_bytes), dtype=np.float64)
    bm = np.asarray(block_max, dtype=np.float64)
    return docs, scores, docs[::block_size], bm


def _wand_shard_kernel(
    pdf: pd.DataFrame, k: int, block_size: int,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Block-max WAND over ONE shard's matching segment rows (columns
    term, qtf, doc_deltas, scores, block_max) -> (top docs, scores).
    Shared by the distributed path and the one-stage serving path.

    ``exclude``: doc ids to suppress (the live-docs bitmap of a
    tombstoned index — deletes become visible at SERVE time, before
    the next merge re-scores the survivors). Excluded docs are dropped
    from the candidate set before any bound or theta is computed, so
    the result is exactly the top-k over surviving docs under the
    STORED scores (re-scoring for the shrunken df/N happens at merge,
    which also records the tombstones it folded so the serve-time
    exclude set shrinks to post-merge deletes)."""
    # decode every term's postings for this shard; iterate terms in
    # ascending order — the global deterministic fold order
    pdf = pdf.sort_values("term")
    entries = [
        _decode_posting(dd, sc, bm, block_size)
        for dd, sc, bm in zip(
            pdf["doc_deltas"].values, pdf["scores"].values,
            pdf["block_max"].values,
        )
    ]
    qtfs = [float(q) for q in pdf["qtf"].values]
    return _wand_core(entries, qtfs, k, exclude)


def _wand_core(
    entries: list[tuple],
    qtfs: list[float],
    k: int,
    exclude: np.ndarray | None = None,
    candidates: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """The block-max WAND math over pre-decoded per-term arrays.
    ``entries``: [(docs, scores, block_first_docs, block_max), ...] in
    ASCENDING term order (the deterministic fold order); ``qtfs``: the
    matching query term frequencies. ``candidates``: optional sorted
    doc-id array restricting the candidate set (boolean retrieval:
    must-intersection minus must_not union) — the bound/theta pruning
    math is unchanged, it just runs over fewer docs."""
    term_docs = [e[0] for e in entries]
    term_scores = [e[1] for e in entries]
    term_qtf = qtfs
    term_bfirst = [e[2] for e in entries]  # first doc of each block
    term_bmax = [e[3] for e in entries]

    # candidate docs = union of posting docs in this shard, unless the
    # caller already narrowed them (boolean gating)
    all_docs = (
        candidates
        if candidates is not None
        else np.unique(np.concatenate(term_docs))
    )
    if exclude is not None and exclude.size and all_docs.size:
        all_docs = all_docs[np.isin(all_docs, exclude, invert=True)]
    if all_docs.size == 0:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)

    # block-level upper bound per candidate doc
    ub = np.zeros(all_docs.size, dtype=np.float64)
    for docs, qtf, bfirst, bmax in zip(
        term_docs, term_qtf, term_bfirst, term_bmax
    ):
        # block index a doc would fall into for this term
        bi = np.searchsorted(bfirst, all_docs, side="right") - 1
        bi = np.clip(bi, 0, bmax.size - 1)
        ub += qtf * bmax[bi]

    order = np.argsort(-ub, kind="stable")
    theta = -np.inf
    top_docs: np.ndarray | None = None
    top_scores: np.ndarray | None = None
    chunk = max(k * 4, 256)
    for start in range(0, order.size, chunk):
        sel = order[start : start + chunk]
        # strict <: a doc with UB == theta could still tie the k-th
        # score and win on the doc_id-asc tie-break
        if top_docs is not None and ub[sel[0]] < theta and top_docs.size >= k:
            break  # no remaining doc can reach the k-th best
        cand = all_docs[sel]
        exact = np.zeros(cand.size, dtype=np.float64)
        # ascending-term accumulation == deterministic fold order
        for docs, scores, qtf in zip(term_docs, term_scores, term_qtf):
            pos = np.searchsorted(docs, cand)
            pos_c = np.clip(pos, 0, docs.size - 1)
            hit = docs[pos_c] == cand
            exact[hit] += qtf * scores[pos_c[hit]]
        if top_docs is None:
            top_docs, top_scores = cand, exact
        else:
            top_docs = np.concatenate([top_docs, cand])
            top_scores = np.concatenate([top_scores, exact])
        # keep only current top-k (score desc, doc asc)
        sort_idx = np.lexsort((top_docs, -top_scores))[:k]
        top_docs, top_scores = top_docs[sort_idx], top_scores[sort_idx]
        if top_scores.size >= k:
            theta = top_scores[-1]
    return top_docs.astype(np.int64), top_scores


def segments_for_serving(
    segments: DataFrame, n_parts: int, batch_rows: int = 1000
) -> DataFrame:
    """Serving cache layout: hash-partition the segment table by shard,
    sort each partition by ``term``, and persist. Every shard's rows
    are then CO-RESIDENT in one cached partition, so a query is one
    mapInPandas over the cache — no join, no shuffle, no window; the
    classic doc-sharded serving replica layout.

    The TERM-SORTED layout is the lookup structure: Spark's in-memory
    columnar cache keeps min/max stats per cached batch and prunes
    batches whose stats cannot satisfy the filter (
    InMemoryTableScanExec supports ``In``), so with rows sorted by term
    each batch covers a narrow term range and a query's ``isin`` touches
    only the few batches actually holding its terms — per-query cost
    scales with result size, not index size (the cache-resident
    equivalent of a searchsorted into a term-sorted array).
    ``batch_rows`` sets the pruning granularity (default 10000 would
    leave only coarse skipping on small shards). The cache is warmed
    here so the batch-size conf can be restored before returning."""
    spark = segments.sparkSession
    key = "spark.sql.inMemoryColumnarStorage.batchSize"
    old = spark.conf.get(key)
    spark.conf.set(key, str(batch_rows))
    try:
        cached = (
            segments.repartition(n_parts, "shard")
            .sortWithinPartitions("term")
            .persist()
        )
        cached.count()  # materialize under the serving batch size
    finally:
        spark.conf.set(key, old)
    return cached


def wand_topk_serve(
    qterms_rows: list[tuple],
    segments_sharded: DataFrame,
    k: int,
    block_size: int,
    exclude_docs=None,
) -> list[tuple]:
    """One-query low-latency top-k: (term, qtf) literals are pushed as
    an isin filter + a literal qtf map into a SINGLE stage over the
    shard-partitioned segment cache (scan -> per-shard WAND kernel ->
    per-shard top-k), merged to the global top-k on the driver (at most
    k rows per shard). Results are identical to ``wand_topk`` — same
    kernel, same tie-break (verified in tests).

    qterms_rows: [(term, qtf), ...] for ONE query.
    ``exclude_docs``: tombstoned doc ids to suppress (closure-captured;
    between merges the tombstone set is small — the merge folds it in).
    Returns [(rank, doc_id, score), ...].
    """
    from itertools import chain

    excl = _normalize_exclude(exclude_docs)
    terms = [int(t) for t, _ in qterms_rows]
    if not terms:
        return []
    qtf_map = F.create_map(
        *chain.from_iterable(
            (F.lit(int(t)), F.lit(float(q))) for t, q in qterms_rows
        )
    )
    seg = segments_sharded.where(F.col("term").isin(terms)).select(
        "shard", "term", qtf_map[F.col("term")].alias("qtf"),
        "doc_deltas", "scores", "block_max",
    )

    def score_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        outs = []
        for _, grp in pdf.groupby("shard", sort=False):
            docs, scores = _wand_shard_kernel(grp, k, block_size, excl)
            if docs.size:
                outs.append(pd.DataFrame({"doc_id": docs, "score": scores}))
        if outs:
            yield pd.concat(outs, ignore_index=True)

    rows = seg.mapInPandas(
        score_partition, schema="doc_id long, score double"
    ).collect()
    if not rows:
        return []
    doc = np.array([r["doc_id"] for r in rows], dtype=np.int64)
    sc = np.array([r["score"] for r in rows], dtype=np.float64)
    idx = np.lexsort((doc, -sc))[:k]  # score desc, doc_id asc — as wand_topk
    return [
        (rank + 1, int(doc[i]), float(sc[i])) for rank, i in enumerate(idx)
    ]


def bounded_in_filter(df: DataFrame, col: str, values: list) -> DataFrame:
    """Filter ``df`` to rows whose long column ``col`` is in ``values``
    — bounded: at or below TERM_FILTER_CUTOFF values a literal In
    filter (pushed into the scan, where per-batch min/max stats prune
    cached/columnar batches); above it a broadcast LEFT SEMI join on a
    values DataFrame (one hash probe per row), because an In
    expression with 100k+ literals costs Catalyst a 100k-literal tree
    to analyze and codegen per job. Trade-off: the semi-join does not
    prune cached batches the way the In filter does, but a value set
    that wide touches most batches anyway. Shared by the batch-serve
    term filter and the ANN query-id filters (embedops) so the
    strategy is tuned in exactly one place."""
    vals = [int(v) for v in values]
    if len(vals) <= TERM_FILTER_CUTOFF:
        return df.where(F.col(col).isin(vals))
    vdf = df.sparkSession.createDataFrame([(v,) for v in vals], f"{col} long")
    return df.join(F.broadcast(vdf), col, "leftsemi")


def _batch_term_filter(segments_sharded: DataFrame, all_terms: list) -> DataFrame:
    """Scan filter for the batch-serve union-of-terms set: a 10k-query
    batch can union to 100k+ distinct terms — see bounded_in_filter."""
    return bounded_in_filter(segments_sharded, "term", all_terms)


def wand_topk_serve_batch(
    queries_terms: list[tuple],
    segments_sharded: DataFrame,
    k: int,
    block_size: int,
    exclude_docs=None,
) -> list[tuple]:
    """Batched serving top-k: N queries in ONE Spark job.

    ``wand_topk_serve`` pays one job-scheduling round-trip per query —
    fine for single-query latency, but it caps serving THROUGHPUT at
    the scheduler rate. This path makes one pass over the term-sorted
    segment cache scoring every query: the scan filter is the UNION of
    all queries' terms (batch min/max stats still prune to the touched
    batches), each (shard, term) posting list is decoded ONCE and
    reused across all queries that contain the term, and the per-query
    WAND core runs on the pre-decoded arrays. Results are IDENTICAL to
    per-query ``wand_topk_serve`` — same kernel math, same ascending-
    term fold, same (score desc, doc_id asc) tie-break (tested).

    queries_terms: [(query_id, [(term, qtf), ...]), ...].
    Returns [(query_id, rank, doc_id, score), ...] in input query
    order."""
    excl = _normalize_exclude(exclude_docs)

    # per-query term lists in ascending-term order (the fold order);
    # queries with no in-vocabulary terms return no rows, as in the
    # per-query path
    qmap = [
        (qid, sorted((t, float(q)) for t, q in rows))
        for qid, rows in queries_terms
        if rows
    ]
    if not qmap:
        return []
    if len({qid for qid, _ in qmap}) != len(qmap):
        # two queries sharing an id would have their candidate rows
        # merged into one top-k on the driver — refuse loudly
        raise ValueError("wand_topk_serve_batch: duplicate query_id")
    all_terms = sorted({t for _, rows in qmap for t, _ in rows})
    seg = _batch_term_filter(segments_sharded, all_terms).select(
        "shard", "term", "doc_deltas", "scores", "block_max"
    )
    spark = segments_sharded.sparkSession
    # broadcast, not closure-capture: a closure ships with EVERY task
    # (cache partitions x queries x terms), a broadcast once per
    # executor; Spark's ContextCleaner reclaims both when the local
    # refs are garbage-collected. The exclude array gets the same
    # treatment — at the tombstone_limit default it is ~8 MB of int64,
    # exactly the per-task shipping cost broadcasting qmap avoids
    excl_bc = spark.sparkContext.broadcast(excl)
    qmap_bc = spark.sparkContext.broadcast(qmap)

    def score_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        outs = []
        excl_local = excl_bc.value
        for _, grp in pdf.groupby("shard", sort=False):
            decoded = {
                t: _decode_posting(dd, sc, bm, block_size)
                for t, dd, sc, bm in zip(
                    grp["term"].values, grp["doc_deltas"].values,
                    grp["scores"].values, grp["block_max"].values,
                )
            }
            for qid, rows in qmap_bc.value:
                entries = [decoded[t] for t, _ in rows if t in decoded]
                if not entries:
                    continue
                qtfs = [q for t, q in rows if t in decoded]
                docs, scores = _wand_core(entries, qtfs, k, excl_local)
                if docs.size:
                    outs.append(
                        pd.DataFrame(
                            {"query_id": qid, "doc_id": docs, "score": scores}
                        )
                    )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    rows = seg.mapInPandas(
        score_partition, schema="query_id string, doc_id long, score double"
    ).collect()
    by_q: dict[str, list[tuple]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    out: list[tuple] = []
    for qid, _ in qmap:
        hits = by_q.get(qid)
        if not hits:
            continue
        doc = np.array([d for d, _ in hits], dtype=np.int64)
        sc = np.array([s for _, s in hits], dtype=np.float64)
        idx = np.lexsort((doc, -sc))[:k]  # score desc, doc_id asc
        out.extend(
            (qid, rank + 1, int(doc[i]), float(sc[i]))
            for rank, i in enumerate(idx)
        )
    return out


def _boolean_candidates(decoded: dict, rows: list, n_must: int):
    """Candidate doc array for one query over one shard's decoded
    postings, or None when the query is unsatisfiable here. rows:
    [(term, qtf, clause)] in ascending-term order; ``decoded`` maps
    term -> (docs, scores, block_first, block_max). Returns
    (pos_entries, qtfs, candidates)."""
    must_docs = []
    neg_docs = []
    pos_entries, qtfs = [], []
    n_must_present = 0
    for term, qtf, clause in rows:
        entry = decoded.get(term)
        if entry is None:
            continue
        if clause == "must_not":
            neg_docs.append(entry[0])
            continue
        pos_entries.append(entry)
        qtfs.append(float(qtf))
        if clause == "must":
            must_docs.append(entry[0])
            n_must_present += 1
    if n_must_present < n_must or not pos_entries:
        return None
    if must_docs:
        cand = must_docs[0]
        for d in must_docs[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
    else:
        cand = np.unique(np.concatenate([e[0] for e in pos_entries]))
    if neg_docs and cand.size:
        neg = np.concatenate(neg_docs)
        cand = cand[np.isin(cand, neg, invert=True)]
    if cand.size == 0:
        return None
    return pos_entries, qtfs, cand


def wand_boolean_serve_batch(
    queries_clauses: list[tuple],
    segments_sharded: DataFrame,
    k: int,
    block_size: int,
    exclude_docs=None,
) -> list[tuple]:
    """Batched boolean serving: N boolean queries in ONE Spark job over
    the term-sorted segment cache — the boolean twin of
    ``wand_topk_serve_batch`` (same decode-once-per-shard sharing, same
    broadcast query map and exclude array, same driver merge), with
    per-query candidate gating via ``_boolean_candidates``. Results are
    IDENTICAL to the distributed ``wand_boolean`` — same kernel math,
    same ascending-term fold, same (score desc, doc_id asc) tie-break
    (tested).

    queries_clauses: [(query_id, n_must, [(term, qtf, clause), ...])].
    Returns [(query_id, rank, doc_id, score), ...] in input order."""
    excl = _normalize_exclude(exclude_docs)
    qmap = [
        (qid, int(n_must), sorted(rows))
        for qid, n_must, rows in queries_clauses
        if rows
    ]
    if not qmap:
        return []
    if len({qid for qid, _n, _r in qmap}) != len(qmap):
        raise ValueError("wand_boolean_serve_batch: duplicate query_id")
    all_terms = sorted({t for _, _, rows in qmap for t, _, _ in rows})
    seg = _batch_term_filter(segments_sharded, all_terms).select(
        "shard", "term", "doc_deltas", "scores", "block_max"
    )
    spark = segments_sharded.sparkSession
    excl_bc = spark.sparkContext.broadcast(excl)
    qmap_bc = spark.sparkContext.broadcast(qmap)

    def score_partition(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        outs = []
        excl_local = excl_bc.value
        for _, grp in pdf.groupby("shard", sort=False):
            decoded = {
                t: _decode_posting(dd, sc, bm, block_size)
                for t, dd, sc, bm in zip(
                    grp["term"].values, grp["doc_deltas"].values,
                    grp["scores"].values, grp["block_max"].values,
                )
            }
            for qid, n_must, rows in qmap_bc.value:
                got = _boolean_candidates(decoded, rows, n_must)
                if got is None:
                    continue
                pos_entries, qtfs, cand = got
                docs, scores = _wand_core(
                    pos_entries, qtfs, k, excl_local, candidates=cand
                )
                if docs.size:
                    outs.append(
                        pd.DataFrame(
                            {"query_id": qid, "doc_id": docs, "score": scores}
                        )
                    )
        if outs:
            yield pd.concat(outs, ignore_index=True)

    rows_out = seg.mapInPandas(
        score_partition, schema="query_id string, doc_id long, score double"
    ).collect()
    by_q: dict[str, list[tuple]] = {}
    for r in rows_out:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    out: list[tuple] = []
    for qid, _n, _r in qmap:
        hits = by_q.get(qid)
        if not hits:
            continue
        doc = np.array([d for d, _ in hits], dtype=np.int64)
        sc = np.array([s for _, s in hits], dtype=np.float64)
        idx = np.lexsort((doc, -sc))[:k]  # score desc, doc_id asc
        out.extend(
            (qid, rank + 1, int(doc[i]), float(sc[i]))
            for rank, i in enumerate(idx)
        )
    return out


def wand_topk(
    qterms: DataFrame,
    segments: DataFrame,
    k: int,
    block_size: int,
    exclude_docs=None,
) -> DataFrame:
    """qterms: (query_id, term, qtf) — idf already lives in the stored
    per-posting scores. segments: the segment table.
    -> (query_id, rank, doc_id, score) global top-k.

    ``exclude_docs``: iterable of tombstoned doc ids; broadcast to the
    scorers and suppressed before any bound is computed (live-docs
    semantics — the top-k over survivors under the stored scores)."""
    exclude_bc = None
    arr = _normalize_exclude(exclude_docs)
    if arr is not None:
        # per-call broadcast; Spark's ContextCleaner reclaims it
        # once the returned plan is garbage-collected, so repeated
        # calls don't accumulate live broadcasts
        exclude_bc = segments.sparkSession.sparkContext.broadcast(arr)
    qseg = segments.join(F.broadcast(qterms), "term", "inner").select(
        "query_id",
        "shard",
        "term",
        "qtf",
        "doc_deltas",
        "scores",
        "block_max",
    )
    partial = wand_topk_per_shard(qseg, k, block_size, exclude_bc)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


_EMPTY_TOPK = (np.array([], dtype=np.int64), np.array([], dtype=np.float64))


def _boolean_shard_kernel(
    pdf: pd.DataFrame, k: int, block_size: int,
    exclude: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Boolean retrieval over ONE shard's matching segment rows
    (columns term, qtf, clause, n_must, doc_deltas, scores, block_max)
    -> (top docs, scores).

    Candidate docs = intersection of the must terms' posting docs
    (union of ALL positive terms' docs when the query has no must
    clause), minus the union of must_not docs; scoring then runs the
    unchanged block-max WAND core over the positive entries restricted
    to those candidates. A doc lives in exactly one doc-range shard,
    so the per-shard intersection is complete. ``n_must`` is the
    query's GLOBAL distinct must-term count: a must term with no
    postings in this shard (or in the whole index) makes the
    intersection unsatisfiable here — fewer must rows than n_must
    short-circuits to empty."""
    pdf = pdf.sort_values("term")
    n_must = int(pdf["n_must"].iloc[0])
    decoded = {
        t: _decode_posting(dd, sc, bm, block_size)
        for t, dd, sc, bm in zip(
            pdf["term"].values, pdf["doc_deltas"].values,
            pdf["scores"].values, pdf["block_max"].values,
        )
    }
    rows = list(
        zip(pdf["term"].values, pdf["qtf"].values, pdf["clause"].values)
    )
    got = _boolean_candidates(decoded, rows, n_must)
    if got is None:
        return _EMPTY_TOPK
    pos_entries, qtfs, cand = got
    return _wand_core(pos_entries, qtfs, k, exclude, candidates=cand)


def wand_boolean(
    qclauses: DataFrame,
    segments: DataFrame,
    k: int,
    block_size: int,
    exclude_docs=None,
) -> DataFrame:
    """Boolean (must / should / must_not) top-k over the compressed
    segment index, BM25-ranked with block-max WAND pruning.

    qclauses: (query_id, term, qtf, clause, n_must) — one row per
    query term, ``clause`` in {'must', 'should', 'must_not'},
    ``n_must`` the query-constant distinct must-term count (carried on
    every row so the per-shard kernel needs no side lookup). A term
    must appear in only ONE clause per query (pipeline.
    wand_boolean_topk enforces this loudly). Scores equal the BM25 sum
    of the stored per-posting scores over the positive clauses — the
    same stored-score math as wand_topk, so results are rank- and
    bit-identical to exhaustive scoring restricted to the boolean
    candidate set. Same (score desc, doc_id asc) tie-break.
    -> (query_id, rank, doc_id, score) global top-k."""
    exclude_bc = None
    arr = _normalize_exclude(exclude_docs)
    if arr is not None:
        exclude_bc = segments.sparkSession.sparkContext.broadcast(arr)
    qseg = segments.join(F.broadcast(qclauses), "term", "inner").select(
        "query_id", "shard", "term", "qtf", "clause", "n_must",
        "doc_deltas", "scores", "block_max",
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        query_id = pdf["query_id"].iloc[0]
        excl = exclude_bc.value if exclude_bc is not None else None
        top_docs, top_scores = _boolean_shard_kernel(
            pdf, k, block_size, excl
        )
        return pd.DataFrame(
            {
                "query_id": query_id,
                "doc_id": top_docs.astype(np.int64),
                "score": top_scores,
            }
        )

    partial = qseg.groupBy("query_id", "shard").applyInPandas(
        score_group, schema="query_id string, doc_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


# ---------------------------------------------------------------------------
# second ranking family over the SAME stored index: LM-Dirichlet
# ---------------------------------------------------------------------------


def doc_lengths_from_segments(segments: DataFrame) -> DataFrame:
    """(doc_id, dl) recovered from the stored tf streams: dl is the sum
    of a document's term frequencies, and every posting of a doc lives
    in its own doc-range shard — so one decode pass + one doc-keyed
    aggregation reconstructs exact document lengths from the segment
    table ALONE. This is what makes the compressed index sufficient
    serve-time state for ranking families beyond the one whose scores
    were precomputed at build (see dirichlet_topk_segments).

    Scale shape: materialized ONCE per index build/merge (like the
    serve cache), not per query; the decode is Arrow-batched NumPy and
    the aggregation is a single doc-keyed exchange whose input is one
    row per posting.
    """

    def explode_rows(it):
        for pdf in it:
            doc_parts, tf_parts = [], []
            for dd, tfb in zip(pdf["doc_deltas"].values, pdf["tfs"].values):
                doc_parts.append(
                    np.cumsum(varbyte_decode(bytes(dd)).astype(np.int64))
                )
                tf_parts.append(varbyte_decode(bytes(tfb)).astype(np.int64))
            if not doc_parts:
                continue
            # PARTIAL per-doc aggregation inside the batch: one Arrow
            # row per distinct doc leaves the kernel instead of one per
            # posting (the JVM aggregate below stays the exact final
            # combine — integer sums, order-free). bincount accumulates
            # in float64; tf sums are exact integers far below 2^53.
            docs = np.concatenate(doc_parts)
            tfs = np.concatenate(tf_parts)
            uniq, inv = np.unique(docs, return_inverse=True)
            sums = np.bincount(inv, weights=tfs).astype(np.int64)
            yield pd.DataFrame({"doc_id": uniq, "tf": sums})

    pairs = segments.select("doc_deltas", "tfs").mapInPandas(
        explode_rows, schema="doc_id long, tf long"
    )
    return pairs.groupBy("doc_id").agg(F.sum("tf").alias("dl"))


#: block granularity of the DERIVED Dirichlet upper bound (see
#: dirichlet_topk_segments): the bound is computed from the decoded tf
#: stream at serve time, so its granularity is a serve-side knob, not
#: a storage-format property
DIRICHLET_BLOCK = 128


def dirichlet_topk_segments(
    qterms: DataFrame,
    segments: DataFrame,
    dl_df: DataFrame,
    mu: float,
    k: int,
    exclude_docs=None,
    c_total: float | None = None,
) -> DataFrame:
    """Query-likelihood/Dirichlet top-k served from the SAME compressed
    segment table the BM25/WAND scorers use — one stored index, two
    ranking families. The per-posting BM25 scores baked into the
    segments are ignored; scoring recomputes from the stored tf
    streams:

        score(q, d) = sum_{t in q AND d} qtf * ln(1 + tf / (mu * (cf_t / C)))
                      + Qlen * ln(mu / (dl_d + mu))

    with cf_t decoded from the query terms' own segment rows, C and dl
    from ``doc_lengths_from_segments`` — every scoring input derives
    from the index, no side artifacts. Matches searchops'
    relational ``lm_dirichlet_topk`` semantics (OOV terms ignored,
    candidates only from the index, ties doc_id-ascending).

    Plan shape (the serve-throughput rebuild of the original
    exhaustive-emit design, which shipped every matched (query, doc)
    partial score out of Python into a dl join + a global window):

    - the scan is pruned to the distinct query terms via
      ``bounded_in_filter`` (cached-batch min/max pruning on the
      term-sorted serve cache — the same filter the BM25 batch path
      uses), instead of a broadcast join that touched every row;
    - ONE cogrouped kernel per shard: the shard's matching posting
      lists are decoded ONCE and their log term contributions shared
      across every query in the batch (the old per-(query, shard)
      grouping re-shipped and re-decoded a shared term's varbyte blobs
      once per query); the shard slice of the dl table rides in
      through the cogroup — co-partitioned by the same doc-range
      sharding, nothing broadcast, nothing collected;
    - the kernel applies the length normalizer in-kernel and runs
      block-max pruning over a DERIVED per-block bound: block maxima
      of ln(1 + tf/(mu*cf/C)) per DIRICHLET_BLOCK postings (the
      Dirichlet term bound VERDICT r5 asked for — derived post-decode
      rather than stored, because the varbyte streams decode whole-
      list anyway, so a stored per-block max_tf could not skip any
      work this layout doesn't already do, and the segment format
      stays byte-identical across rounds). UB(d) = Qlen*ln(mu/(dl_d+mu))
      + sum_t qtf*blockmax_t[block(d)] >= score(d), so candidates are
      exactly evaluated in UB-descending chunks until UB < theta — the
      skipped tail provably cannot enter the top-k;
    - each shard emits at most k rows per query (a doc lives in
      exactly one doc-range shard), so the global window ranks
      shards*k*queries candidate rows instead of every match.

    Determinism: bit-identical to the exhaustive-emit design — exact
    evaluation accumulates qtf * ln(...) per document in ascending-term
    order (the same sequential fold np.add.reduceat performed), and the
    normalizer is one trailing addition, as before.

    ``exclude_docs``: tombstoned doc ids, suppressed inside the shard
    kernel before any result leaves it — the same live-docs-under-
    stored-stats contract as the WAND paths (cf/C/dl keep their stored
    values until the next merge re-scores the survivors).
    ``c_total``: the collection token count, if the caller already
    holds it (it is constant per snapshot — WarehouseServer caches it
    next to the dl table); None computes it from ``dl_df``.
    """
    # qterms is a tiny driver-created DataFrame in every caller (the
    # query pipeline output) — pulling it back is bounded by the query
    # set, not the corpus
    qrows = [
        (r["query_id"], int(r["term"]), float(r["qtf"]))
        for r in qterms.collect()
    ]
    return dirichlet_topk_segments_rows(
        qrows, segments, dl_df, mu, k, exclude_docs, c_total
    )


def _cf_for_terms(segments: DataFrame, uterms: list) -> dict:
    """cf (collection frequency) per query term, decoded from the
    pruned segment rows — with a PER-SNAPSHOT memo attached to the
    segments DataFrame handle: cf is index metadata (constant until
    the next merge swaps the snapshot's segments handle), exactly like
    the dl table the callers already reuse across queries, so repeat
    queries over one serving cache skip the cf job entirely. The memo
    lives on the DF object — a snapshot swap hands out a fresh handle,
    so staleness is impossible; only the queried terms are ever
    materialized (bounded by query size, never vocabulary-sized)."""
    cache = getattr(segments, "_flame_dirichlet_cf", None)
    if cache is None:
        cache = {}
        segments._flame_dirichlet_cf = cache
    missing = [t for t in uterms if t not in cache]
    if missing:

        @F.pandas_udf("long")
        def row_tf_sum(tfb: pd.Series) -> pd.Series:
            return pd.Series(
                [int(varbyte_decode(bytes(b)).sum()) for b in tfb],
                dtype="int64",
            )

        rows = (
            bounded_in_filter(segments, "term", missing)
            .select("term", row_tf_sum(F.col("tfs")).alias("rtf"))
            .groupBy("term")
            .agg(F.sum("rtf").alias("cf"))
            .collect()
        )
        for r in rows:
            cache[int(r["term"])] = float(r["cf"])
    return {t: cache[t] for t in uterms if t in cache}


def dirichlet_topk_segments_rows(
    qrows: list[tuple],
    segments: DataFrame,
    dl_df: DataFrame,
    mu: float,
    k: int,
    exclude_docs=None,
    c_total: float | None = None,
) -> DataFrame:
    """``dirichlet_topk_segments`` over driver-side (query_id, term,
    qtf) rows — the serving entry: the query pipeline already produced
    these rows on the driver, so shipping them through a DataFrame
    just to collect them back costs a createDataFrame + collect
    round-trip per batch."""
    spark = segments.sparkSession
    excl_arr = _normalize_exclude(exclude_docs)

    if c_total is None:
        c_total = float(dl_df.agg(F.sum("dl")).collect()[0][0] or 0.0)
    if c_total <= 0.0:
        raise ValueError("dirichlet_topk_segments: empty index (C = 0)")

    qrows = [(q, int(t), float(c)) for q, t, c in qrows]
    uterms = sorted({t for _, t, _ in qrows})
    out_schema = "query_id string, doc_id long, score double"
    if not uterms:
        partial = spark.createDataFrame([], out_schema)
    else:
        seg = bounded_in_filter(segments, "term", uterms).select(
            "shard", "term", "first_doc", "last_doc", "doc_deltas", "tfs"
        )
        cf = _cf_for_terms(segments, uterms)
        # per-query term lists in ascending-term order (the fold
        # order); Qlen counts qtf over IN-VOCABULARY terms only, as the
        # relational path does
        qmap = []
        for qid in dict.fromkeys(q for q, _, _ in qrows):
            rows = sorted(
                (t, q) for q2, t, q in qrows if q2 == qid and t in cf
            )
            if rows:
                qmap.append((qid, rows, float(sum(q for _, q in rows))))
        # dl rows co-partitioned with their doc-range shard: shard
        # bounds from the matched segment rows themselves (tiny,
        # broadcast); candidates always fall inside their shard's
        # matched [min first_doc, max last_doc] span
        # fresh exprIds on the bounds side: dl_df and seg both descend
        # from the segment table, so the range join would otherwise
        # trip the ambiguous-self-join analysis
        bounds = seg.groupBy("shard").agg(
            F.min("first_doc").alias("_lo"), F.max("last_doc").alias("_hi")
        ).select(
            F.col("shard").alias("_bshard"),
            F.col("_lo").alias("_lo"),
            F.col("_hi").alias("_hi"),
        )
        dlb = dl_df.join(
            F.broadcast(bounds),
            (F.col("doc_id") >= F.col("_lo")) & (F.col("doc_id") <= F.col("_hi")),
        ).select(
            F.col("_bshard").alias("shard"), F.col("doc_id"), F.col("dl")
        )

        qmap_bc = spark.sparkContext.broadcast(qmap)
        cf_bc = spark.sparkContext.broadcast(cf)
        excl_bc = spark.sparkContext.broadcast(excl_arr)
        mu_f, c_tot, kk = float(mu), float(c_total), int(k)

        def score_shard(seg_pdf: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []})
            if not len(seg_pdf) or not len(dl_pdf):
                return empty
            cf_map = cf_bc.value
            decoded = {}
            for t, dd, tfb in zip(
                seg_pdf["term"].values, seg_pdf["doc_deltas"].values,
                seg_pdf["tfs"].values,
            ):
                docs = np.cumsum(varbyte_decode(bytes(dd)).astype(np.int64))
                tfs = varbyte_decode(bytes(tfb)).astype(np.float64)
                # the exact per-posting term contribution BEFORE qtf —
                # shared across every query containing the term
                logv = np.log(1.0 + tfs / (mu_f * (cf_map[int(t)] / c_tot)))
                bidx = np.arange(0, logv.size, DIRICHLET_BLOCK)
                decoded[int(t)] = (
                    docs, logv, docs[bidx], np.maximum.reduceat(logv, bidx)
                )
            dldocs = dl_pdf["doc_id"].to_numpy(np.int64)
            order = np.argsort(dldocs)
            dldocs = dldocs[order]
            dlvals = dl_pdf["dl"].to_numpy(np.float64)[order]
            excl = excl_bc.value
            outs = []
            for qid, rows, qlen in qmap_bc.value:
                entries = [
                    (decoded[t], q) for t, q in rows if t in decoded
                ]
                if not entries:
                    continue
                cand = np.unique(
                    np.concatenate([e[0][0] for e in entries])
                )
                if excl is not None and excl.size:
                    cand = cand[np.isin(cand, excl, invert=True)]
                if not cand.size:
                    continue
                pos = np.clip(
                    np.searchsorted(dldocs, cand), 0, dldocs.size - 1
                )
                valid = dldocs[pos] == cand
                cand = cand[valid]
                if not cand.size:
                    continue
                norm = qlen * np.log(mu_f / (dlvals[pos[valid]] + mu_f))
                ub = norm.copy()
                for (docs, _lv, bfirst, bmax), q in entries:
                    bi = np.clip(
                        np.searchsorted(bfirst, cand, side="right") - 1,
                        0, bmax.size - 1,
                    )
                    ub += q * bmax[bi]
                order_ub = np.argsort(-ub, kind="stable")
                theta = -np.inf
                top_docs = top_scores = None
                chunk = max(kk * 4, 256)
                for start in range(0, order_ub.size, chunk):
                    sel = order_ub[start : start + chunk]
                    # strict <: a doc with UB == theta could still tie
                    # the k-th score and win on the doc_id tie-break
                    if (
                        top_docs is not None
                        and ub[sel[0]] < theta
                        and top_docs.size >= kk
                    ):
                        break
                    cd = cand[sel]
                    exact = np.zeros(cd.size, dtype=np.float64)
                    # ascending-term accumulation, normalizer added
                    # LAST — the exhaustive fold order exactly
                    for (docs, logv, _bf, _bm), q in entries:
                        p = np.clip(
                            np.searchsorted(docs, cd), 0, docs.size - 1
                        )
                        hit = docs[p] == cd
                        exact[hit] += q * logv[p[hit]]
                    scores = exact + norm[sel]
                    if top_docs is None:
                        top_docs, top_scores = cd, scores
                    else:
                        top_docs = np.concatenate([top_docs, cd])
                        top_scores = np.concatenate([top_scores, scores])
                    keep = np.lexsort((top_docs, -top_scores))[:kk]
                    top_docs, top_scores = top_docs[keep], top_scores[keep]
                    if top_scores.size >= kk:
                        theta = top_scores[-1]
                if top_docs is not None and top_docs.size:
                    outs.append(
                        pd.DataFrame(
                            {
                                "query_id": qid,
                                "doc_id": top_docs.astype(np.int64),
                                "score": top_scores,
                            }
                        )
                    )
            return pd.concat(outs, ignore_index=True) if outs else empty

        partial = (
            seg.groupBy("shard")
            .cogroup(dlb.groupBy("shard"))
            .applyInPandas(score_shard, schema=out_schema)
        )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
