"""Tests for training-data pipeline operators: dedup correctness
properties, LSH-ANN recall vs brute force, multimodal plumbing,
streaming incremental paths."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )


def test_exact_dedup_finds_planted_duplicates(spark):
    from flame_spark.textops import exact_dedup_groups

    docs = _docs(spark).limit(20).union(
        _docs(spark).limit(3).withColumn("doc_id", F.col("doc_id") + 1000)
    )
    groups = exact_dedup_groups(docs).collect()
    assert len(groups) == 3
    assert all(g["n_docs"] == 2 for g in groups)
    assert all(g["keeper_doc_id"] < 1000 for g in groups)


def test_minhash_estimates_jaccard(spark):
    """Property: fraction of agreeing minhashes ~ true Jaccard."""
    from flame_spark.textops import minhash_signatures, ngram_jaccard_pairs

    docs = _docs(spark).limit(60)
    sigs = minhash_signatures(docs, n=3, num_hashes=64)
    a = sigs.alias("a")
    b = sigs.alias("b")
    agree = (
        a.join(b, "i")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn("eq", (F.col("a.minhash") == F.col("b.minhash")).cast("int"))
        .groupBy(F.col("a.doc_id").alias("doc_i"), F.col("b.doc_id").alias("doc_j"))
        .agg((F.sum("eq") / F.count("*")).alias("est"))
    )
    true_j = ngram_jaccard_pairs(docs, n=3, threshold=0.0).select(
        "doc_i", "doc_j", "jaccard"
    )
    joined = agree.join(true_j, ["doc_i", "doc_j"]).collect()
    assert joined
    errs = [abs(r["est"] - r["jaccard"]) for r in joined]
    assert np.mean(errs) < 0.15  # 64 hashes -> stderr ~ sqrt(j(1-j)/64)


def test_simhash_similar_docs_close(spark):
    from flame_spark.textops import simhash

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy cat again and again"),
            (2, "completely unrelated words here about database query planners"),
        ],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    d01 = bin(h[0] ^ h[1]).count("1")
    d02 = bin(h[0] ^ h[2]).count("1")
    assert d01 < d02


def test_ivf_ann_recall_vs_bruteforce(spark):
    from flame_spark.embedops import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        load_embeddings,
    )

    emb = load_embeddings(spark, SF)
    qids = [0, 1, 2, 3, 4]
    bf = cosine_topk_bruteforce(emb, qids, k=5).collect()
    ivf = cosine_topk_ivf(emb, qids, k=5, n_clusters=16, n_probe=6).collect()
    bf_sets = {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    ivf_sets = {}
    for r in ivf:
        ivf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(bf_sets[q] & ivf_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert np.mean(recalls) >= 0.6, recalls


def test_lsh_ann_runs_and_scores_match_bruteforce_when_found(spark):
    """LSH on these near-orthogonal synthetic embeddings has weak recall
    (documented); verify the machinery: every returned (query, vec)
    cosine must equal the brute-force cosine for that pair."""
    from flame_spark.embedops import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
        load_embeddings,
    )

    emb = load_embeddings(spark, SF)
    qids = [0, 1, 2]
    bf = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in cosine_topk_bruteforce(emb, qids, k=499).collect()
    }
    lsh = cosine_topk_lsh(emb, qids, k=5, n_planes=10).collect()
    assert lsh  # returns candidates
    for r in lsh:
        assert bf[(r["query_id"], r["vec_id"])] == r["cosine"]


def _clustered_embeddings(spark, n_clusters=8, per_cluster=40, dim=64, seed=7):
    """Clustered fixture: tight clusters (intra-cluster cosine ≳0.9,
    inter ≲0.3) — the regime real embedding near-dups live in, unlike
    the near-orthogonal testdata embeddings (VERDICT r1 item 8)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(n_clusters):
        pts = centers[c] + 0.018 * rng.standard_normal((per_cluster, dim))
        for p in pts:
            rows.append((vid, c, [float(x) for x in p]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, vec array<double>"
    ).select("vec_id", "vec", "cluster")


def test_blocked_embed_pairs_equal_allpairs(spark):
    """The block-grid gram kernel must be VALUE-identical (ids and
    rounded cosines) to the all-pairs theta-join baseline — exactness
    is the contract, the blocking only changes the plan."""
    from flame_spark.embedops import (
        embed_cosine_pairs_allpairs,
        embed_cosine_pairs_blocked,
        load_embeddings,
    )

    emb = load_embeddings(spark, SF).select("vec_id", "vec")
    base = sorted(
        tuple(r) for r in embed_cosine_pairs_allpairs(emb, 0.35).collect()
    )
    for n_blocks in (2, 7):
        blk = sorted(
            tuple(r)
            for r in embed_cosine_pairs_blocked(emb, 0.35, n_blocks=n_blocks).collect()
        )
        assert blk == base
    assert len(base) > 100  # non-trivial pair set at sf0.001


def test_blocked_embed_pairs_sparse_ids_and_empty_blocks(spark):
    """Regression: an off-diagonal cell (bi, bj) whose b-block holds no
    vectors (sparse vec_ids / n_blocks above the residue count) must
    emit NOTHING — the old kernel inferred 'diagonal' from b-side
    absence and re-emitted block bi's intra-block pairs once per empty
    higher block (duplicate pairs that would corrupt dedup groups)."""
    from flame_spark.embedops import (
        embed_cosine_pairs_allpairs,
        embed_cosine_pairs_blocked,
        load_embeddings,
    )
    from pyspark.sql import functions as F

    emb = load_embeddings(spark, SF).select("vec_id", "vec")
    # all ids ≡ 1 (mod 5): with n_blocks=5, blocks 0/2/3/4 are empty, so
    # cells (1,2) (1,3) (1,4) exist from a-side replication alone
    sparse = emb.select((F.col("vec_id") * 5 + 1).alias("vec_id"), "vec")
    base = sorted(
        tuple(r) for r in embed_cosine_pairs_allpairs(sparse, 0.35).collect()
    )
    blk = sorted(
        tuple(r)
        for r in embed_cosine_pairs_blocked(sparse, 0.35, n_blocks=5).collect()
    )
    assert blk == base
    # n_blocks far above N: most cells degenerate, result still exact
    tiny = emb.limit(12)
    base_t = sorted(
        tuple(r) for r in embed_cosine_pairs_allpairs(tiny, 0.35).collect()
    )
    blk_t = sorted(
        tuple(r)
        for r in embed_cosine_pairs_blocked(tiny, 0.35, n_blocks=64).collect()
    )
    assert blk_t == base_t


def test_blocked_embed_pairs_strip_budget(spark, monkeypatch):
    """Memory-safe grid at extreme N: with a forced tiny strip budget
    the kernel computes the score matrix in bounded row strips and the
    output stays value-identical — per-task temp is strip*r*8 bytes
    even when a block grows past block_target_rows."""
    from flame_spark import embedops
    from flame_spark.embedops import (
        embed_cosine_pairs_allpairs,
        load_embeddings,
    )

    monkeypatch.setenv("FLAME_EMBED_STRIP_ROWS", "256")
    emb = load_embeddings(spark, SF).select("vec_id", "vec")
    base = sorted(
        tuple(r) for r in embed_cosine_pairs_allpairs(emb, 0.35).collect()
    )
    # n_blocks=1 → one 500-row diagonal cell at sf0.001; strip=256
    # forces two strips through the score matrix
    blk = sorted(
        tuple(r)
        for r in embedops.embed_cosine_pairs_blocked(
            emb, 0.35, n_blocks=1
        ).collect()
    )
    assert blk == base


def test_lsh_near_dup_exact_on_clustered_fixture(spark):
    """At a real near-dup threshold on clustered data the banded-LSH
    path must (a) recover the exact brute-force pair set and (b) prune:
    candidate pairs well below N(N-1)/2."""
    from flame_spark.embedops import (
        embed_cosine_pairs_allpairs,
        embed_near_dup_lsh,
        load_embeddings,
    )

    emb = _clustered_embeddings(spark).select("vec_id", "vec").persist()
    thr = 0.9
    # wide bands (5 sign bits x 10 bands): the parameter regime for a
    # high threshold — per-pair recall ~1-4e-6 at cosine 0.98 while a
    # noise pair (cosine~0) collides with prob ~27% per the LSH formula
    n_planes, band_rows = 50, 5
    exact = sorted(tuple(r) for r in embed_cosine_pairs_allpairs(emb, thr).collect())
    lsh = sorted(
        tuple(r)
        for r in embed_near_dup_lsh(
            emb, thr, n_planes=n_planes, band_rows=band_rows
        ).collect()
    )
    assert len(exact) > 500  # intra-cluster pairs exist
    assert lsh == exact
    # pruning: count distinct candidate pairs the band join generates
    from flame_spark.embedops import _hyperplanes

    n = emb.count()
    all_pairs = n * (n - 1) // 2
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.stack([np.asarray(r["vec"]) for r in rows])
    planes = _hyperplanes(X.shape[1], n_planes, 42)
    bits = ((X @ planes.T) >= 0).astype(np.int64)
    w = 1 << np.arange(band_rows)
    cand = set()
    for band in range(n_planes // band_rows):
        key = bits[:, band * band_rows : (band + 1) * band_rows] @ w
        for v in np.unique(key):
            members = ids[key == v]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    cand.add((min(members[i], members[j]), max(members[i], members[j])))
    assert len(cand) < 0.5 * all_pairs, (len(cand), all_pairs)
    emb.unpersist()


def test_lsh_ann_recall_on_clustered_fixture(spark):
    """LSH ANN with multiprobe reaches usable recall on clustered data
    (the near-orthogonal testdata defeats any angular LSH — documented)."""
    from flame_spark.embedops import cosine_topk_bruteforce, cosine_topk_lsh

    emb = _clustered_embeddings(spark).select("vec_id", "vec").persist()
    qids = [0, 45, 90, 135, 180]
    bf = cosine_topk_bruteforce(emb, qids, k=5).collect()
    lsh = cosine_topk_lsh(emb, qids, k=5, n_planes=12).collect()
    bf_sets, lsh_sets = {}, {}
    for r in bf:
        bf_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in lsh:
        lsh_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(bf_sets[q] & lsh_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets
    ]
    assert np.mean(recalls) >= 0.8, recalls
    emb.unpersist()


def test_multimodal_plumbing(spark):
    from flame_spark.multimodal import (
        extract_metadata,
        frame_sample,
        image_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, 30).persist()
    meta = extract_metadata(media).collect()
    assert len(meta) == 30 and all(m["ok"] for m in meta)
    kinds = {m["media_id"]: m["kind"] for m in meta}
    assert set(kinds.values()) == {"image", "audio", "video"}

    feats = image_features(media).collect()
    assert len(feats) == 10  # every 3rd row is an image
    assert all(len(f["features"]) == 16 for f in feats)
    # deterministic fake decode: same blob -> same features
    feats2 = {f["media_id"]: f["features"] for f in image_features(media).collect()}
    assert all(feats2[f["media_id"]] == f["features"] for f in feats)

    frames = frame_sample(media, every=16).collect()
    assert frames and all(f["frame_idx"] % 16 == 0 for f in frames)


def test_decode_image_raises_for_real_bytes():
    from flame_spark.multimodal import decode_image, HAVE_PIL

    if not HAVE_PIL:
        with pytest.raises(NotImplementedError):
            decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)


def test_streaming_incremental_postings(spark, tmp_path):
    from flame_spark.data import transcripts_df
    from flame_spark.streaming import run_incremental_postings_once
    from flame_spark.textops import word_tokens_col

    tdf = transcripts_df(spark, 4, 5)
    tdf.write.mode("overwrite").parquet(str(tmp_path / "stream_in"))
    rows = run_incremental_postings_once(spark, str(tmp_path / "stream_in"))
    # streaming deltas == batch TF over the same files
    batch = (
        spark.read.parquet(str(tmp_path / "stream_in"))
        .select("conv_id", "turn_idx", F.explode(word_tokens_col(F.col("text"))).alias("term"))
        .groupBy("conv_id", "turn_idx", "term")
        .agg(F.count("*").alias("tf"))
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))


def test_streaming_windowed_events_dir(spark, tmp_path):
    from flame_spark.streaming import run_windowed_event_counts_once

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.write.mode("overwrite").parquet(str(tmp_path / "ev"))
    rows = run_windowed_event_counts_once(spark, str(tmp_path / "ev"))
    batch_n = ev.count()
    assert sum(r["n"] for r in rows) == batch_n


def test_connected_components_vs_bfs_oracle(spark):
    """Min-label propagation CC must match a driver-side BFS on chains
    (worst diameter), cycles, singletons, and a random graph."""
    from collections import defaultdict, deque

    from flame_spark.graphops import connected_components, dedup_groups

    rng = np.random.default_rng(11)
    n = 120
    edges = [(i, i + 1) for i in range(0, 20)]          # chain 0..20
    edges += [(30 + i, 30 + (i + 1) % 8) for i in range(8)]  # cycle 30..37
    edges += [
        (int(a), int(b))
        for a, b in rng.integers(50, 110, size=(40, 2))
        if a != b
    ]  # random clumps; 110..119 singletons

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    for start in range(n):
        if start in expected:
            continue
        comp, q = {start}, deque([start])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in comp:
                    comp.add(u)
                    q.append(u)
        m = min(comp)
        for v in comp:
            expected[v] = m

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    for algorithm in ("star", "label"):
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                nodes, edf, algorithm=algorithm
            ).collect()
        }
        assert got == expected, algorithm

    groups = dedup_groups(nodes, edf, "id", "src", "dst").collect()
    keepers = {r["id"] for r in groups if r["is_keeper"]}
    assert keepers == set(expected.values())


def test_connected_components_chain_round_bound(spark):
    """Adversarial 200-node chain: the alternating large-star/small-star
    algorithm must converge in O(log n) shuffle rounds (label
    propagation needs O(n) = 200 here, and must now RAISE rather than
    silently return partially-propagated labels when its round budget
    is exceeded)."""
    import math

    import pytest

    from flame_spark.graphops import connected_components_with_rounds

    n = 200
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    # shuffle the ids along the chain so neither endpoint is the min
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    edges = [(int(perm[i]), int(perm[i + 1])) for i in range(n - 1)]
    edf = spark.createDataFrame(edges, "src long, dst long")

    labels, rounds = connected_components_with_rounds(nodes, edf)
    got = {r["id"]: r["component"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    # O(log n): 2*ceil(log2 n) + a couple of settle/fixpoint rounds
    assert rounds <= 2 * math.ceil(math.log2(n)) + 3, rounds

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_with_rounds(
            nodes, edf, algorithm="label", max_rounds=10
        )


def test_minhash_lsh_pairs_wide_equals_long_form(spark):
    """r6 optimization pin: the wide-aggregate banding path
    (minhash_lsh_pairs — band keys projected off the per-doc MIN
    aggregate row) must produce EXACTLY the pair set of the long-form
    composition minhash_lsh_candidates(minhash_signatures(...)), for a
    band width that divides num_hashes and one that does not."""
    from flame_spark.textops import (
        minhash_lsh_candidates, minhash_lsh_pairs, minhash_signatures,
    )

    docs = _docs(spark).limit(80)
    for num_hashes, band_rows in ((16, 4), (10, 4)):
        long_form = {
            (r["doc_i"], r["doc_j"])
            for r in minhash_lsh_candidates(
                minhash_signatures(docs, n=3, num_hashes=num_hashes),
                band_rows=band_rows,
            ).collect()
        }
        wide_form = {
            (r["doc_i"], r["doc_j"])
            for r in minhash_lsh_pairs(
                docs, n=3, num_hashes=num_hashes, band_rows=band_rows
            ).collect()
        }
        assert wide_form == long_form


def test_dirichlet_rows_entry_and_cf_memo(spark):
    """r6 optimization pin: the rows-based serving entry must equal the
    DataFrame entry tuple-for-tuple, the per-snapshot cf memo must not
    change repeat-call results, and a FRESH segments handle (new
    snapshot) must not inherit the old handle's memo."""
    from flame_spark.config import FlameConfig
    from flame_spark.fastbuild import build_serving_index
    from flame_spark.pipeline import query_terms_local
    from flame_spark.wand import (
        dirichlet_topk_segments, dirichlet_topk_segments_rows,
        doc_lengths_from_segments,
    )

    docs = _docs(spark).limit(120)
    cfg = FlameConfig(
        ngram=3, n_out=1, min_text_length=0, tokenizer="word",
        term_mode="lno", n_shards=4,
    )
    serving = build_serving_index(docs, cfg)
    segments = serving.segments.persist()
    segments.count()
    dl_df = doc_lengths_from_segments(segments).persist()
    from flame_spark.queries import BM25_QUERIES

    queries = [
        {"query_id": qid, "query_text": qt} for qid, qt in BM25_QUERIES[:2]
    ]
    qterms = query_terms_local(spark, queries, serving)
    qrows = [(r["query_id"], r["term"], r["qtf"]) for r in qterms.collect()]

    def key(df):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in df.collect()
        )

    df_entry = key(dirichlet_topk_segments(qterms, segments, dl_df, 2000.0, 5))
    rows_entry = key(
        dirichlet_topk_segments_rows(qrows, segments, dl_df, 2000.0, 5)
    )
    assert df_entry == rows_entry and df_entry
    # repeat call hits the cf memo attached to the handle — identical
    assert hasattr(segments, "_flame_dirichlet_cf")
    assert key(
        dirichlet_topk_segments_rows(qrows, segments, dl_df, 2000.0, 5)
    ) == df_entry
    # a fresh handle (snapshot swap) starts without the memo and still
    # scores identically
    fresh = segments.sparkSession.createDataFrame(
        segments.collect(), segments.schema
    )
    assert not hasattr(fresh, "_flame_dirichlet_cf")
    assert key(
        dirichlet_topk_segments_rows(qrows, fresh, dl_df, 2000.0, 5)
    ) == df_entry
    segments.unpersist()
    dl_df.unpersist()
