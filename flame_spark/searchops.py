"""Structured-query search surface over the word-token index: boolean
retrieval, positional phrase search, and prefix suggest.

The reference's query surface is a single free-text BM25 ranking
(flame.py:1056-1090, re-expressed in bm25.py/wand.py); a full-text
index at corpus scale also serves STRUCTURED queries. These three
operators extend the same posting-table data model — (term, doc_id,
tf) plus doc lengths and term stats — with no new storage format:

- ``boolean_topk``   : Lucene-style must / should / must_not clauses,
  BM25-scored over the positive clauses (must terms both gate AND
  score, as in Lucene's BooleanQuery).
- ``phrase_topk``    : exact-adjacency phrase match counted over token
  positions (overlapping occurrences included), ranked by phrase tf.
- ``prefix_suggest`` : type-ahead completion over the vocabulary,
  ranked by document frequency.
- ``fuzzy_expand``   : SymSpell/FastSS deletion-neighborhood expansion
  of query terms to their Levenshtein-distance<=1 vocabulary terms.
- ``fuzzy_topk``     : BM25 over the expanded (typo-tolerant) term set.
- ``bm25f_topk``     : role-weighted BM25F over multi-turn
  conversations (each role is a field with its own weight).
- ``snippets_for_topk``: first-match snippet extraction for a ranked
  result set (token window around the earliest query-term hit).
- ``more_like_this`` : seed-document similarity search — the seed's
  most characteristic terms (integer-deterministic tf/df selection)
  become a BM25 query over the rest of the corpus.
- ``lm_dirichlet_topk``: query-likelihood ranking with Dirichlet-prior
  smoothing (Zhai & Lafferty 2001) — a second ranking family over the
  same postings, in its sparse rank-equivalent form.
- ``facet_counts``   : matched-set facet aggregation (counts per
  metadata value over the docs matching any query term).
- ``near_topk``      : two-term proximity search — docs where the
  terms co-occur within a token window, ranked by closest distance.
- ``prf_topk``       : RM3-style pseudo-relevance feedback — BM25
  feedback docs contribute integer-deterministic expansion terms, the
  expanded query is rescored with the canonical BM25.

All of these are pure DataFrame compositions (zero Python on the row
path); the oracle SQL twins live in queries.py.

Scale notes (100 TB shapes):
- boolean: ONE broadcast join (postings x query terms, clause and
  n_must carried on the broadcast rows) feeding ONE (query_id, doc_id)
  aggregate that computes score, must-count, and negated flag
  together — a single shuffle over matched postings, no join on
  aggregate results, no per-clause passes.
- phrase: the posexplode stream is pruned by the broadcast join on the
  phrase terms BEFORE any shuffle, so shuffled rows are proportional
  to matched-term occurrences, not corpus tokens; one explicit
  repartition on (query_id, doc_id) then lets BOTH the per-start
  adjacency count and the per-doc phrase tf aggregate run
  shuffle-free (hash(q,d) clusters every (q,d,start) group).
- prefix: prefixes are grouped by length so each group is a broadcast
  HASH equi-join on substring(term, 1, L) — no nested-loop scan per
  prefix, one vocab pass per distinct prefix length.
- fuzzy: NO vocab cross join — candidate generation is a hash
  equi-join on deletion-neighborhood keys (one generator expression
  per vocab term, all JVM-side), verified by an exact levenshtein
  filter. One vocab pass regardless of query count.
- bm25f: weighted tf/dl are computed in the same two aggregations a
  plain BM25 build needs (the role weight rides the token projection),
  so field weighting adds zero extra shuffles.
- snippets: the positional stream is pruned by the broadcast
  query-term join BEFORE the min-position aggregate, and the ranked
  top-k (q x k rows) is broadcast back into the token table — snippet
  assembly never shuffles the corpus.
- dirichlet: identical join/aggregate skeleton to BM25 (one broadcast
  of query terms + collection stats, one (query, doc) shuffle); the
  document-length normalizer joins AFTER the aggregate on the tiny
  candidate set, so the second scoring family costs no extra corpus
  pass.
- facets: the corpus-sized work is ONE distinct over (query, doc)
  matches pruned by the broadcast term join; facet columns ride a
  doc_id join and unpivot into a single count aggregate (one stack
  projection, not one pass per facet field).
- near: position streams are pruned by the broadcast term join before
  any shuffle; both sides hash-partition on (query, doc), and the
  min-distance partial-aggregates inside the join stage — shuffle
  volume is matched-term occurrences, the per-doc tf_a x tf_b pair
  expansion never crosses the wire.
- prf: the feedback-doc set is q x fb_k rows (broadcast); expansion
  selection is one aggregate over postings pruned by that broadcast;
  the rescore is the same one-shuffle BM25 with a slightly wider
  broadcast query side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .bm25 import _det_sum
from .postings import CorpusStats


def _pruned_postings_dl(
    postings: DataFrame, dl: DataFrame, qterms: DataFrame
) -> DataFrame:
    """postings pruned to the query-term set (broadcast LEFT SEMI on
    term) BEFORE the doc-length join — guide §3: reduce the big side
    before shuffling it. score_bm25's own inner query join drops the
    non-query-term rows anyway, so pruning first changes no surviving
    row or value; it only keeps the corpus-sized posting stream out of
    the dl exchange."""
    keep = F.broadcast(qterms.select("term").distinct())
    return postings.join(keep, "term", "leftsemi").join(dl, "doc_id")


def boolean_topk(
    qdefs_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Boolean BM25 top-k.

    qdefs_rows: [(query_id, term, clause)] with clause in
    {'must', 'should', 'must_not'}; a term may appear in only ONE
    clause per query. A doc is a candidate iff it contains EVERY must
    term and NO must_not term; its score is the BM25 sum (qtf=1) over
    the must+should terms it contains (must terms gate AND score, as
    in Lucene's BooleanQuery). Ties break doc_id-ascending.
    -> (query_id, rank, doc_id, score) with score rounded to 6 dp.

    ONE pass over the postings: the broadcast query side carries
    clause + n_must per row, so a single (query_id, doc_id) aggregate
    produces the score, the matched-must count, and the negated flag
    together — no per-clause joins, no join on the aggregate results.
    must_not matches contribute exactly 0.0 inside the deterministic
    term-ordered fold (adding 0.0 to the positive partial sums is a
    bitwise no-op), so the score equals score_bm25 over the positive
    clauses bit-for-bit.
    """
    from .floatops import np_log

    spark = postings.sparkSession
    n_must: dict[str, int] = {}
    for qid, _t, clause in qdefs_rows:
        n_must.setdefault(qid, 0)
        if clause == "must":
            n_must[qid] += 1
    if len({(q, t) for q, t, _ in qdefs_rows}) != len(qdefs_rows):
        raise ValueError("boolean_topk: duplicate (query_id, term)")
    qdefs = spark.createDataFrame(
        [(q, t, c, n_must[q]) for q, t, c in qdefs_rows],
        "query_id string, term string, clause string, n_must int",
    )
    n, avgdl = float(stats.n_docs), float(stats.avgdl)
    # idf per query term (tiny result: qdefs is broadcast into the
    # corpus-sized stats; absent terms drop out — they can match no doc)
    q_idf = stats_df.join(F.broadcast(qdefs), "term", "inner").select(
        "term", "query_id", "clause", "n_must",
        np_log(
            (F.lit(n) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    # prune postings with the broadcast query side BEFORE attaching dl
    # (guide: reduce the big side before shuffling it) — inner joins
    # commute, so the surviving rows and values are identical
    joined = postings.join(F.broadcast(q_idf), "term").join(dl, "doc_id")
    denom_dl = 1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl)
    tf_comp = (F.col("tf") * (k1 + 1.0)) / (F.col("tf") + F.lit(k1) * denom_dl)
    contrib = F.when(
        F.col("clause") != "must_not", F.col("idf") * tf_comp
    ).otherwise(F.lit(0.0))
    agg = (
        joined.select(
            "query_id",
            "doc_id",
            "clause",
            "n_must",
            F.col("term").alias("t"),
            contrib.alias("val"),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            _det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias(
                "score"
            ),
            F.countDistinct(
                F.when(F.col("clause") == "must", F.col("t"))
            ).alias("mh"),
            F.max(
                F.when(F.col("clause") == "must_not", 1).otherwise(0)
            ).alias("negged"),
            F.first("n_must").alias("n_must"),
        )
    )
    cand = agg.where(
        (F.col("mh") == F.col("n_must")) & (F.col("negged") == 0)
    )

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )


def phrase_topk(
    phrase_rows: list[tuple], docs_tokens: DataFrame, k: int
) -> DataFrame:
    """Positional phrase top-k.

    phrase_rows: [(query_id, [w0, w1, ...])] — each phrase is an exact
    token-adjacency match; OVERLAPPING occurrences count ("batch batch"
    occurs twice in "batch batch batch"), which is why the count is
    positional, not a substring split. docs_tokens: (doc_id, tokens).
    -> (query_id, rank, doc_id, phrase_tf), ranked phrase_tf desc then
    doc_id asc; docs with zero occurrences are absent.

    A phrase of length n occurs at start s iff token s+off equals
    phrase[off] for every off — so each matched (term, position) pair
    votes for start = pos - off, and a start with all n distinct
    offsets present is an occurrence.
    """
    spark = docs_tokens.sparkSession
    rows = [
        (qid, w, off, len(ws))
        for qid, ws in phrase_rows
        for off, w in enumerate(ws)
    ]
    pterms = spark.createDataFrame(
        rows, "query_id string, term string, off int, n int"
    )
    pos = docs_tokens.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = (
        pos.join(F.broadcast(pterms), "term")
        .select(
            "query_id",
            "doc_id",
            (F.col("pos") - F.col("off")).alias("start"),
            "off",
            "n",
        )
        .where(F.col("start") >= 0)
        # one exchange for BOTH aggregations below: hash(q, d) clusters
        # every (q, d, start) group and every (q, d) group
        .repartition(n_parts, "query_id", "doc_id")
    )
    occ = (
        m.groupBy("query_id", "doc_id", "start", "n")
        .agg(F.countDistinct("off").alias("hits"))
        .where(F.col("hits") == F.col("n"))
    )
    ptf = occ.groupBy("query_id", "doc_id").agg(
        F.count("*").cast("long").alias("phrase_tf")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("phrase_tf"), F.asc("doc_id")
    )
    return (
        ptf.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "phrase_tf",
        )
    )


def prefix_suggest(
    prefixes: list[str], stats_df: DataFrame, k: int
) -> DataFrame:
    """Type-ahead completion: for each prefix, the top-k vocabulary
    terms starting with it, ranked df desc then term asc.
    stats_df: (term, df, cf) from postings.term_stats.
    -> (prefix, rank, term, df).

    Prefixes are grouped by length so each group joins as a broadcast
    HASH join on substring(term, 1, L) — a 3-prefix suggest is a few
    vocab passes, never a per-row nested loop.
    """
    spark = stats_df.sparkSession
    by_len: dict[int, list[str]] = {}
    for p in prefixes:
        by_len.setdefault(len(p), []).append(p)
    parts = []
    for length, group in sorted(by_len.items()):
        pdf = spark.createDataFrame([(p,) for p in group], "prefix string")
        parts.append(
            stats_df.withColumn(
                "prefix", F.substring(F.col("term"), 1, length)
            ).join(F.broadcast(pdf), "prefix")
        )
    cand = parts[0]
    for more in parts[1:]:
        cand = cand.unionByName(more)
    w = Window.partitionBy("prefix").orderBy(F.desc("df"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "prefix",
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("df").cast("long").alias("df"),
        )
    )


def fuzzy_expand(
    qdefs_rows: list[tuple], stats_df: DataFrame, max_dist: int = 1
) -> DataFrame:
    """Typo-tolerant term expansion: for each (query_id, qterm), every
    vocabulary term within Levenshtein distance <= max_dist, with its
    document frequency. -> (query_id, qterm, term, dist, df).

    Candidate generation is the SymSpell / FastSS deletion-neighborhood
    join: two strings are within edit distance 1 iff their depth-1
    deletion neighborhoods (the string itself plus every
    single-character deletion) intersect — so the vocabulary side emits
    len(term)+1 variant keys per term in ONE generator expression
    (array_distinct folds duplicate deletions like "scann" -> "scan"
    twice), the tiny query side emits its own neighborhood and is
    broadcast, and candidates meet in a hash equi-join on the variant
    key. Every candidate is then VERIFIED with Spark's built-in
    ``levenshtein`` (JVM-side), so false positives from shared variants
    (e.g. "ab"/"ba" share "a" at distance 2) are filtered exactly;
    completeness at distance 1 is the SymSpell property. max_dist is
    capped at 1: the depth-1 neighborhood proof is distance-specific
    and depth-2 neighborhoods grow quadratically in term length.

    Scale shape: one vocabulary pass, ~avg_len+1 variant rows per vocab
    term, broadcast query side — no cross join, no per-prefix scans.
    """
    if max_dist != 1:
        raise ValueError("fuzzy_expand: only max_dist=1 is supported")
    spark = stats_df.sparkSession
    qrows, seen = [], set()
    for qid, qt in qdefs_rows:
        if (qid, qt) in seen:
            raise ValueError(f"fuzzy_expand: duplicate (query_id, qterm) {(qid, qt)}")
        seen.add((qid, qt))
        neigh = {qt} | {qt[:i] + qt[i + 1 :] for i in range(len(qt))}
        qrows.extend((qid, qt, v) for v in sorted(neigh))
    qv = spark.createDataFrame(
        qrows, "query_id string, qterm string, variant string"
    )
    vocab = (
        stats_df.select("term", "df")
        .withColumn(
            "variant",
            F.explode(
                F.expr(
                    "array_distinct(concat(array(term), "
                    "transform(sequence(1, length(term)), i -> "
                    "concat(substring(term, 1, i - 1), "
                    "substring(term, i + 1, length(term))))))"
                )
            ),
        )
    )
    cand = (
        vocab.join(F.broadcast(qv), "variant")
        .select("query_id", "qterm", "term", "df")
        .distinct()
        .withColumn("dist", F.levenshtein("qterm", "term").cast("long"))
        .where(F.col("dist") <= max_dist)
    )
    return cand.select(
        "query_id", "qterm", "term", "dist", F.col("df").cast("long").alias("df")
    )


def fuzzy_topk(
    qdefs_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Fuzzy BM25 top-k: expand each query term to its distance<=1
    vocabulary neighborhood (``fuzzy_expand``), then BM25-score the
    DISTINCT expanded term set per query with qtf=1 — a vocabulary term
    reachable from several query terms contributes once. Queries whose
    expansion is empty return no rows. Ties break doc_id-ascending.
    Scoring delegates to the canonical ``bm25.score_bm25`` (the one
    definition of the frozen formula; qtf=1 makes the qtf multiply a
    bitwise no-op). -> (query_id, rank, doc_id, score), score at 6 dp.
    """
    from .bm25 import score_bm25, topk

    qterms = (
        fuzzy_expand(qdefs_rows, stats_df)
        .select("query_id", "term")
        .distinct()
        .withColumn("qtf", F.lit(1))
    )
    scored = score_bm25(
        qterms, _pruned_postings_dl(postings, dl, qterms), stats_df, stats,
        k1, b,
    )
    return topk(scored, k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def bm25f_topk(
    qterms_rows: list[tuple],
    turn_tokens: DataFrame,
    role_weights: dict[str, float],
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Role-weighted BM25F over multi-turn conversations (simplified
    BM25F, Robertson & Zaragoza 2009 §3.5 with shared k1/b): each ROLE
    is a field with weight w_r; weighted tf(t, conv) = sum over turns
    of w_role * tf(t, turn), weighted length dl(conv) = sum of
    w_role * n_tokens(turn), and the standard BM25 saturation runs on
    the weighted quantities. df/N/avgdl are conversation-level (df is
    unweighted: #convs containing the term; N and avgdl include
    zero-token conversations).

    turn_tokens: (conv_id, role, tokens array<string>) — one row per
    turn. qterms_rows: [(query_id, term, qtf)]. A turn role absent from
    role_weights raises (silently zero-weighting a field would corrupt
    scores). Weights should be dyadic rationals (e.g. 2.0, 0.5) so the
    weighted sums are exact in float64 regardless of aggregation order.
    -> (query_id, rank, conv_id, score) with score rounded to 6 dp.

    Scale shape: the weight rides the token projection, so weighted
    tf/dl cost exactly the two aggregations a plain BM25 build needs —
    field weighting adds zero shuffles; query side broadcast. Once the
    weighted (tf, dl, df, N, avgdl) quantities exist, scoring delegates
    to the canonical ``bm25.score_bm25`` — BM25F is plain BM25 over
    weighted inputs, not a second formula to keep in sync.
    """
    from .bm25 import score_bm25, topk
    from .postings import CorpusStats

    spark = turn_tokens.sparkSession
    wmap = F.create_map(
        *[F.lit(x) for kv in sorted(role_weights.items()) for x in kv]
    )
    w_checked = F.when(
        wmap[F.col("role")].isNull(),
        F.raise_error(
            F.concat(F.lit("bm25f_topk: no weight for role "), F.col("role"))
        ).cast("double"),
    ).otherwise(wmap[F.col("role")])
    tok = turn_tokens.select(
        "conv_id", w_checked.alias("w"), F.explode("tokens").alias("term")
    )
    wtf = tok.groupBy("conv_id", "term").agg(F.sum("w").alias("wtf"))
    dl = turn_tokens.select(
        "conv_id", (w_checked * F.size("tokens")).alias("wl")
    ).groupBy("conv_id").agg(F.sum("wl").alias("dl"))
    n_docs, avgdl = dl.agg(
        F.count("*").cast("double"), F.avg("dl")
    ).first()
    dfr = wtf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    qterms = spark.createDataFrame(
        qterms_rows, "query_id string, term string, qtf int"
    )
    postings_dl = _pruned_postings_dl(
        wtf.select(
            F.col("conv_id").alias("doc_id"), "term", F.col("wtf").alias("tf")
        ),
        dl.select(F.col("conv_id").alias("doc_id"), "dl"),
        qterms,
    )
    scored = score_bm25(
        qterms,
        postings_dl,
        dfr,
        CorpusStats(n_docs=int(n_docs), avgdl=float(avgdl)),
        k1,
        b,
    )
    return topk(scored, k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("doc_id").alias("conv_id"),
        F.round("score", 6).alias("score"),
    )


def snippets_for_topk(
    top: DataFrame,
    qterms_rows: list[tuple],
    docs_tokens: DataFrame,
    width: int,
) -> DataFrame:
    """First-match snippets for a ranked result set: for each
    (query_id, doc_id) in ``top``, the earliest token position of ANY
    query term in the document and the ``width``-token window starting
    there (clipped at the document end), joined with spaces.
    top: (query_id, rank, doc_id, ...); qterms_rows: [(query_id, term)];
    docs_tokens: (doc_id, tokens). Every top row whose document
    contains at least one query term appears (BM25 top-k rows always
    do — their score comes from a match).
    -> (query_id, rank, doc_id, first_pos, snippet).

    The positional stream is pruned by BOTH the query terms AND the
    top-k doc ids (their join is q x k x |terms| rows, broadcast)
    BEFORE the min-position aggregate — so the shuffle input is
    bounded by matched positions inside top-k documents, never by
    every document that happens to contain a (possibly stop-like)
    query term corpus-wide.
    """
    spark = docs_tokens.sparkSession
    pts = spark.createDataFrame(
        sorted(set(qterms_rows)), "query_id string, term string"
    )
    pos = docs_tokens.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    hit_terms = pts.join(top.select("query_id", "rank", "doc_id"), "query_id")
    hit = (
        pos.join(F.broadcast(hit_terms), ["doc_id", "term"])
        .groupBy("query_id", "rank", "doc_id")
        .agg(F.min("pos").alias("first_pos"))
    )
    return docs_tokens.join(F.broadcast(hit), "doc_id").select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("first_pos").cast("long").alias("first_pos"),
        F.array_join(
            F.slice("tokens", F.col("first_pos") + 1, F.lit(width)), " "
        ).alias("snippet"),
    )


def more_like_this(
    seed_doc_ids: list[int],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
    m_terms: int,
    k: int,
) -> DataFrame:
    """Lucene-style "more like this": for each seed document, select
    its ``m_terms`` most characteristic terms and BM25-rank the rest of
    the corpus against them (the seed itself is excluded).

    Term selection is integer-deterministic — per seed, postings are
    ranked by (tf DESC, df ASC, term ASC), i.e. the seed's most
    frequent terms with rarity (lowest document frequency) breaking tf
    ties. That is the tf-idf selection intent without comparing float
    products, so the selected set is bit-reproducible across engines.
    Scoring delegates to the canonical ``bm25.score_bm25`` with qtf=1
    over the selected set (the seed doc's own score group is dropped
    whole AFTER aggregation — per-(query, doc) groups are independent,
    so the exclusion point cannot change any other score).
    -> (seed_doc_id, rank, doc_id, score) with score rounded to 6 dp.

    Scale shape: the seed filter is a tiny IN over postings (one pass,
    prunable), selection is a window over seeds-only rows, and the
    seeds x m_terms expansion is broadcast into the postings join —
    identical cost to a ``len(seeds) * m_terms``-term query batch.
    """
    from .bm25 import score_bm25, topk

    if not seed_doc_ids:
        raise ValueError("more_like_this: empty seed_doc_ids")
    seed_rows = postings.where(
        F.col("doc_id").isin([int(s) for s in seed_doc_ids])
    ).select(F.col("doc_id").alias("query_id"), "term", "tf")
    sel_w = Window.partitionBy("query_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    qterms = (
        seed_rows.join(stats_df, "term")
        .withColumn("rn", F.row_number().over(sel_w))
        .where(F.col("rn") <= m_terms)
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )
    scored = score_bm25(
        qterms, _pruned_postings_dl(postings, dl, qterms), stats_df, stats,
        k1, b,
    ).where(F.col("doc_id") != F.col("query_id"))
    return topk(scored, k).select(
        F.col("query_id").alias("seed_doc_id"),
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def lm_dirichlet_topk(
    qterms_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    mu: float,
    k: int,
) -> DataFrame:
    """Query-likelihood top-k with Dirichlet-prior smoothing (Zhai &
    Lafferty 2001), the standard second ranking family next to BM25,
    in its sparse rank-equivalent form:

        score(q, d) = sum_{t in q AND d} qtf_t * ln(1 + tf_td / (mu * (cf_t / C)))
                      + Qlen * ln(mu / (dl_d + mu))

    where C is the total collection token count, cf_t the collection
    frequency, and Qlen the summed qtf over IN-VOCABULARY query terms
    (out-of-vocabulary terms have p(t|C) = 0 and are ignored, the
    Indri/Anserini convention). Candidates are docs matching at least
    one in-vocab query term — exactly the set an inverted index can
    enumerate; the dl-normalizer is a per-document constant shift that
    cannot promote a zero-match document above it being absent.

    qterms_rows: [(query_id, term, qtf)].
    -> (query_id, rank, doc_id, score) with score rounded to 6 dp;
    ties break doc_id-ascending.

    Determinism: per-term contributions fold in fixed term order
    (``_det_sum``); the length normalizer is one addition after the
    fold, so scores are bit-stable across partitionings and match the
    SQL oracle's sorted-term summation.
    """
    from .floatops import np_log

    spark = postings.sparkSession
    if len({(q, t) for q, t, _ in qterms_rows}) != len(qterms_rows):
        raise ValueError("lm_dirichlet_topk: duplicate (query_id, term)")
    qterms = spark.createDataFrame(
        qterms_rows, "query_id string, term string, qtf int"
    )
    c_total = float(dl.agg(F.sum("dl")).collect()[0][0] or 0.0)
    if c_total <= 0.0:
        raise ValueError("lm_dirichlet_topk: empty collection (C = 0)")
    # in-vocab query terms pick up cf from the term stats (tiny result)
    q_cf = qterms.join(
        stats_df.select("term", "cf"), "term", "inner"
    ).select("query_id", "term", "qtf", F.col("cf").cast("double").alias("cf"))
    qlen = q_cf.groupBy("query_id").agg(
        F.sum("qtf").cast("double").alias("qlen")
    )
    joined = postings.join(F.broadcast(q_cf), "term")
    contrib = F.col("qtf") * np_log(
        1.0
        + F.col("tf").cast("double")
        / (F.lit(mu) * (F.col("cf") / F.lit(c_total)))
    )
    agg = (
        joined.select(
            "query_id", "doc_id", F.col("term").alias("t"), contrib.alias("val")
        )
        .groupBy("query_id", "doc_id")
        .agg(_det_sum(F.col("t").alias("t"), F.col("val").alias("val")).alias("s"))
    )
    scored = (
        agg.join(dl, "doc_id")
        .join(F.broadcast(qlen), "query_id")
        .withColumn(
            "score",
            F.col("s")
            + F.col("qlen")
            * np_log(F.lit(mu) / (F.col("dl").cast("double") + F.lit(mu))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )


def facet_counts(
    qterms_rows: list[tuple],
    postings: DataFrame,
    doc_meta: DataFrame,
    facet_cols: list[str],
) -> DataFrame:
    """Search-result facet aggregation: for each query, the number of
    MATCHED documents (docs containing >= 1 query term, OR semantics)
    per value of each facet column — the counts a search UI shows next
    to its filters.

    qterms_rows: [(query_id, term)] (duplicates folded); doc_meta:
    (doc_id, <facet_cols...>). -> (query_id, facet, value, n_docs),
    one row per (query, facet column, observed value).

    Scale shape: the corpus-sized step is postings x broadcast(terms)
    -> distinct (query_id, doc_id); facet values then ride a doc_id
    join and ONE ``stack`` unpivot feeds a single count aggregate —
    adding a facet column adds zero passes. NULL facet values count
    under their own row (a search UI's "unknown" bucket) — the stack
    literal keeps the facet NAME non-null, and groupBy treats a null
    VALUE as one group.
    """
    spark = postings.sparkSession
    if not facet_cols:
        raise ValueError("facet_counts: no facet columns")
    qt = spark.createDataFrame(
        sorted(set(qterms_rows)), "query_id string, term string"
    )
    matched = (
        postings.join(F.broadcast(qt), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    pairs = ", ".join(f"'{c}', {c}" for c in facet_cols)
    unpivot = F.expr(
        f"stack({len(facet_cols)}, {pairs}) AS (facet, value)"
    )
    return (
        matched.join(doc_meta, "doc_id")
        .select("query_id", unpivot)
        .groupBy("query_id", "facet", "value")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


def near_topk(
    near_rows: list[tuple], docs_tokens: DataFrame, k: int
) -> DataFrame:
    """Two-term proximity (NEAR/w) search: for each query
    (query_id, term_a, term_b, window), the documents containing BOTH
    terms with minimum token distance min |pos_a - pos_b| <= window,
    ranked closest-first (min_dist asc, doc_id asc).
    -> (query_id, rank, doc_id, min_dist).

    term_a == term_b is rejected (self-proximity is degenerate: the
    minimum |pos - pos| over the same occurrence list is 0).

    Scale shape: the posexplode streams are pruned by the broadcast
    query-term join BEFORE any shuffle; both sides then hash-partition
    on (query_id, doc_id) and the min-distance aggregate
    partial-aggregates inside the join stage, so the per-doc
    tf_a x tf_b pair expansion is compute inside one task, never rows
    over the wire.
    """
    spark = docs_tokens.sparkSession
    seen = set()
    for qid, a, b, w in near_rows:
        if a == b:
            raise ValueError(f"near_topk: term_a == term_b for {qid!r}")
        if qid in seen:
            raise ValueError(f"near_topk: duplicate query_id {qid!r}")
        seen.add(qid)
    sides = [(qid, t, side) for qid, a, b, _w in near_rows
             for side, t in (("a", a), ("b", b))]
    qdf = spark.createDataFrame(sides, "query_id string, term string, side string")
    wins = spark.createDataFrame(
        [(qid, int(w)) for qid, _a, _b, w in near_rows],
        "query_id string, win int",
    )
    pos = docs_tokens.select(
        "doc_id", F.posexplode("tokens").alias("pos", "term")
    )
    hits = pos.join(F.broadcast(qdf), "term").select(
        "query_id", "doc_id", "side", "pos"
    )
    pa = hits.where(F.col("side") == "a").select(
        "query_id", "doc_id", F.col("pos").alias("pa")
    )
    pb = hits.where(F.col("side") == "b").select(
        "query_id", "doc_id", F.col("pos").alias("pb")
    )
    mind = (
        pa.join(pb, ["query_id", "doc_id"])
        .groupBy("query_id", "doc_id")
        .agg(F.min(F.abs(F.col("pa") - F.col("pb"))).cast("long").alias("min_dist"))
    )
    cand = mind.join(F.broadcast(wins), "query_id").where(
        F.col("min_dist") <= F.col("win")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("min_dist"), F.asc("doc_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            "min_dist",
        )
    )


def prf_topk(
    qterms_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
    fb_k: int,
    m_terms: int,
    k: int,
) -> DataFrame:
    """RM3-style pseudo-relevance feedback: run the base BM25 query,
    take the top ``fb_k`` documents as (pseudo-)relevant, mine
    ``m_terms`` expansion terms from them, and rescore the corpus with
    the expanded query.

    Expansion selection is integer-deterministic, the more_like_this
    convention: candidate terms from the feedback docs rank by
    (summed tf over feedback docs DESC, df ASC, term ASC), original
    query terms excluded — no float weights compared, so the selected
    set is bit-reproducible across engines. The expanded query keeps
    the original integer qtf and adds each expansion term with qtf=1;
    both scoring passes delegate to the canonical ``bm25.score_bm25``
    (one formula definition). -> (query_id, rank, doc_id, score),
    score at 6 dp, ties doc_id-ascending.

    Queries whose base result is empty (all terms OOV) stay empty —
    no feedback docs, no expansion, no candidates.
    """
    from .bm25 import score_bm25, topk

    spark = postings.sparkSession
    qterms = spark.createDataFrame(
        qterms_rows, "query_id string, term string, qtf int"
    )
    fb = (
        topk(
            score_bm25(
                qterms, _pruned_postings_dl(postings, dl, qterms),
                stats_df, stats, k1, b,
            ),
            fb_k,
        )
        .select("query_id", "doc_id")
    )
    cand = (
        postings.join(F.broadcast(fb), "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum("tf").cast("long").alias("fbtf"))
        .join(stats_df.select("term", "df"), "term")
        .join(
            F.broadcast(qterms.select("query_id", "term")),
            ["query_id", "term"],
            "left_anti",
        )
    )
    sel_w = Window.partitionBy("query_id").orderBy(
        F.desc("fbtf"), F.asc("df"), F.asc("term")
    )
    expansion = (
        cand.withColumn("rn", F.row_number().over(sel_w))
        .where(F.col("rn") <= m_terms)
        .select("query_id", "term", F.lit(1).alias("qtf"))
    )
    q2 = qterms.unionByName(expansion)
    scored = score_bm25(
        q2, _pruned_postings_dl(postings, dl, q2), stats_df, stats, k1, b
    )
    return topk(scored, k).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.round("score", 6).alias("score"),
    )


def hybrid_rrf_topk(
    qterms_rows: list[tuple],
    qvec_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    emb: DataFrame,
    k1: float,
    b: float,
    k_lex: int,
    k_dense: int,
    rrf_k: int,
    k: int,
) -> DataFrame:
    """Hybrid lexical + dense retrieval fused by Reciprocal Rank
    Fusion (Cormack, Clarke & Buettcher 2009): each query has a text
    part (BM25 over the word postings, canonical ``bm25.score_bm25``)
    and a dense part (exact cosine top-k over the embedding table,
    ``embedops.cosine_topk_bruteforce``, self-vector excluded); a doc
    appearing in either ranked list scores

        rrf(d) = [d in lex]  * 1/(rrf_k + lex_rank(d))
               + [d in dense] * 1/(rrf_k + dense_rank(d))

    RRF is rank-based — no score-scale calibration between the two
    retrievers, and the fused score is a sum of two exactly
    representable reciprocals in a fixed order, so it is
    bit-deterministic across engines and partitionings.

    qterms_rows: [(query_id, term, qtf)]; qvec_rows:
    [(query_id, query_vec_id)] — embeddings are keyed by vec_id
    aligned with doc_id. A query with only OOV text degrades to
    dense-only (its lexical list is empty); a query_vec_id absent
    from the embedding table degrades to lexical-only.
    -> (query_id, rank, doc_id, score) with score rounded to 6 dp;
    ties break doc_id-ascending.

    Scale shape: both branch outputs are q x k ranked lists (tiny);
    the fusion full-outer join and final window never touch corpus
    rows. The expensive parts are the branches themselves — one
    broadcast-BM25 pass and one broadcast-query dense sweep (swap in
    ``cosine_topk_ivf`` for the sub-linear dense path at scale).
    """
    from .bm25 import score_bm25, topk
    from .embedops import cosine_topk_bruteforce

    spark = postings.sparkSession
    if len({q for q, _v in qvec_rows}) != len(qvec_rows):
        raise ValueError("hybrid_rrf_topk: duplicate query_id in qvec_rows")
    qterms = spark.createDataFrame(
        qterms_rows, "query_id string, term string, qtf int"
    )
    lex = topk(
        score_bm25(
            qterms, _pruned_postings_dl(postings, dl, qterms),
            stats_df, stats, k1, b,
        ),
        k_lex,
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    vec_ids = sorted({int(v) for _q, v in qvec_rows})
    qmap = spark.createDataFrame(
        [(q, int(v)) for q, v in qvec_rows], "query_id string, qvec_id long"
    )
    dense = (
        cosine_topk_bruteforce(emb, vec_ids, k=k_dense)
        .withColumnRenamed("query_id", "qvec_id")
        .withColumnRenamed("rank", "dense_rank")
        .join(F.broadcast(qmap), "qvec_id")
        .select("query_id", F.col("vec_id").alias("doc_id"), "dense_rank")
    )
    fused = lex.join(dense, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0)
            )
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            F.round("score", 6).alias("score"),
        )
    )


def normalize_stored_queries(pqueries: list[dict]) -> list[dict]:
    """Validate + normalize a stored-query registry — ONE definition of
    the percolation contract shared by the batch (``percolate``) and
    streaming (``streaming.percolate_stream``) deployments. Returns
    [{query_id, must, should, must_not, min_should, clause_of}] with
    min_should defaulted to 1 for must-less queries (the Lucene/ES
    convention) and clause_of the term -> clause map."""
    out = []
    seen_ids: set = set()
    for q in pqueries:
        qid = q["query_id"]
        if qid in seen_ids:
            raise ValueError(f"percolate: duplicate query_id {qid!r}")
        seen_ids.add(qid)
        must = list(q.get("must") or [])
        should = list(q.get("should") or [])
        must_not = list(q.get("must_not") or [])
        if not must and not should:
            raise ValueError(f"percolate: query {qid!r} has no positive term")
        seen: dict = {}
        for clause, terms in (("must", must), ("should", should),
                              ("must_not", must_not)):
            for t in terms:
                if t in seen:
                    raise ValueError(
                        f"percolate: term {t!r} in both {seen[t]!r} and "
                        f"{clause!r} of query {qid!r}"
                    )
                seen[t] = clause
        min_should = q.get("min_should")
        if min_should is None:
            min_should = 1 if not must else 0
        min_should = int(min_should)
        if min_should < 0 or (not must and min_should < 1):
            # a must-less query with min_should < 1 would CLAIM to match
            # docs sharing no term with it — results an inverted index
            # cannot enumerate, so the registry is rejected up front
            raise ValueError(
                f"percolate: query {qid!r} has min_should={min_should}; "
                "must-less queries need min_should >= 1"
            )
        out.append({
            "query_id": qid, "must": must, "should": should,
            "must_not": must_not, "min_should": min_should,
            "clause_of": seen,
        })
    return out


def percolate(pqueries: list[dict], docs_tokens: DataFrame) -> DataFrame:
    """Reverse search (the Elasticsearch percolator): match every
    document against a registry of STORED boolean queries — the
    routing/alerting primitive of a transcript pipeline (route
    conversations to reviewers, trigger on policy terms, tag topics).

    pqueries: [{"query_id", "must": [terms], "should": [terms],
    "must_not": [terms], "min_should": int}]. A doc matches a query
    iff it contains EVERY must term, at least ``min_should`` of the
    should terms, and NO must_not term. ``min_should`` defaults to 1
    when the query has no must terms (the Lucene/ES convention — some
    positive evidence is always required), else 0. A term may appear
    in only one clause per query; a query with no positive (must or
    should) term is refused — matching it would mean scanning docs
    that share NO term with it, which no inverted index can enumerate.
    -> (query_id, doc_id), one row per match.

    Scale shape: the stored-query registry is inverted into a tiny
    (term -> query, clause) table and BROADCAST; the corpus-sized work
    is one distinct-token explode joined against it and ONE
    (query_id, doc_id) aggregate counting must/should/must_not hits
    together (the boolean_topk shape reversed) — per-doc cost is
    proportional to its distinct terms that appear in ANY stored
    query, never to the registry size.
    """
    spark = docs_tokens.sparkSession
    rows = []
    for q in normalize_stored_queries(pqueries):
        rows.extend(
            (q["query_id"], t, c, len(q["must"]), q["min_should"])
            for t, c in q["clause_of"].items()
        )
    qdf = spark.createDataFrame(
        rows,
        "query_id string, term string, clause string, n_must int, "
        "min_should int",
    )
    toks = docs_tokens.select(
        "doc_id", F.explode(F.array_distinct("tokens")).alias("term")
    )
    agg = (
        toks.join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.when(F.col("clause") == "must", 1)).alias("mh"),
            F.count(F.when(F.col("clause") == "should", 1)).alias("sh"),
            F.count(F.when(F.col("clause") == "must_not", 1)).alias("ng"),
            F.first("n_must").alias("n_must"),
            F.first("min_should").alias("min_should"),
        )
    )
    return agg.where(
        (F.col("mh") == F.col("n_must"))
        & (F.col("sh") >= F.col("min_should"))
        & (F.col("ng") == 0)
    ).select("query_id", "doc_id")


def explain_topk(
    qterms_rows: list[tuple],
    postings: DataFrame,
    dl: DataFrame,
    stats_df: DataFrame,
    stats: CorpusStats,
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Scoring explain (the Lucene ``Explanation`` analog): for each
    query's top-k documents, the per-term score breakdown — tf, df,
    idf and the contribution qtf * (idf * tf_comp) that entered the
    deterministic fold. The breakdown rows come from the SAME
    ``bm25.contributions`` stage ``score_bm25`` aggregates (one
    formula definition): the pre-round contributions re-sum to the
    served score bit-for-bit; the DELIVERED rows are rounded to 6 dp,
    so their sum reproduces it to that rounding.
    -> (query_id, rank, doc_id, term, tf, df, idf, contrib), idf and
    contrib at 6 dp.

    Scale shape: ranking is the normal one-shuffle BM25; the breakdown
    join is the q x k top table broadcast back into the contribution
    rows — explain costs one extra broadcast join, never a second
    corpus pass beyond the contribution recomputation.
    """
    from .bm25 import contributions, score_bm25, topk

    spark = postings.sparkSession
    qterms = spark.createDataFrame(
        qterms_rows, "query_id string, term string, qtf int"
    )
    pdl = _pruned_postings_dl(postings, dl, qterms)
    top = topk(
        score_bm25(qterms, pdl, stats_df, stats, k1, b), k
    ).select("query_id", "rank", "doc_id")
    rows = contributions(qterms, pdl, stats_df, stats, k1, b).join(
        F.broadcast(top), ["query_id", "doc_id"]
    )
    return rows.select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        F.col("t").alias("term"),
        F.col("tf").cast("long").alias("tf"),
        F.col("df").cast("long").alias("df"),
        F.round("idf", 6).alias("idf"),
        F.round("val", 6).alias("contrib"),
    )
