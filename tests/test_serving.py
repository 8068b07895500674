"""WarehouseServer: serving that follows merges and deletes live."""

import pytest
from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.data import transcripts_df
from flame_spark.incremental import IncrementalIndexer
from flame_spark.serving import WarehouseServer

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=0, tokenizer="word",
    term_mode="lno", n_shards=4, block_size=4,
)
Q = [{"query_id": "q0",
      "query_text": "in nomine sancte et individue trinitatis amen"}]


def test_server_follows_merges_and_deletes(spark, tmp_path):
    full = transcripts_df(spark, 14, 6).persist()
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)

    # no snapshot yet -> explicit error
    idx.initial_build(full.filter(F.col("conv_id") < "conv000008"))
    srv = WarehouseServer(idx, spark)
    with pytest.raises(RuntimeError, match="no committed snapshot"):
        srv.query(Q)

    idx.merge_segments(spark)
    r1 = srv.query(Q, k=20)
    assert r1
    snap1 = srv.snapshot_id
    docs1 = {d for _, _, d, _ in r1}

    # append + merge: the server swaps to the new snapshot by itself
    idx.ingest(full.filter(F.col("conv_id") >= "conv000008"), on_oov="extend")
    assert srv.query(Q, k=20) == r1  # not merged yet -> same snapshot
    idx.merge_segments(spark)
    r2 = srv.query(Q, k=20)
    assert srv.snapshot_id != snap1
    docs2 = {d for _, _, d, _ in r2}
    assert docs2 > docs1  # formulaic query matches new convs too

    # batch path: identical tuples through the server facade
    assert srv.query_batch(Q, k=20) == r2

    # delete the current top conversation: visible at the NEXT query,
    # before any merge
    import os

    top_doc = next(d for _, rank, d, _ in r2 if rank == 1)
    docmap = spark.read.parquet(os.path.join(idx.root, "docmap"))
    conv = docmap.filter(F.col("doc_id") == top_doc).collect()[0]["conv_id"]
    idx.delete_conversations(spark, [conv])
    deleted = set(idx.deleted_doc_ids(spark).tolist())
    r3 = srv.query(Q, k=20)
    assert not any(d in deleted for _, _, d, _ in r3)
    assert srv.snapshot_id != snap1  # still the merged snapshot

    # merge folds the delete in; results unchanged (same survivors,
    # rescored) modulo scores -> doc sets must still exclude deleted
    idx.merge_segments(spark)
    r4 = srv.query(Q, k=20)
    assert not any(d in deleted for _, _, d, _ in r4)
    assert {d for _, _, d, _ in r3} == {d for _, _, d, _ in r4}

    # purge drops the tombstones; serving keeps excluding (now baked
    # into the index itself)
    idx.purge_tombstones(spark)
    r5 = srv.query(Q, k=20)
    assert {d for _, _, d, _ in r5} == {d for _, _, d, _ in r4}
    srv.close()
    full.unpersist()


def test_ingest_serve_soak(spark, tmp_path):
    """Property-style soak: a writer thread drives ingest batches,
    deletes, periodic merges and compactions while a WarehouseServer
    answers queries THROUGHOUT. Every response must be internally
    consistent (recomputable from the snapshot + exclude set it was
    served under) and safe (no doc whose delete completed before the
    query began is ever returned) — i.e. no torn reads across the
    concurrent maintenance. Collected-vocab config: serving then never
    directory-lists delta tables, which is the supported concurrency
    envelope for compaction (see compact_deltas docstring)."""
    import os
    import threading
    import time as _t

    full = transcripts_df(spark, 40, 5).persist()

    def batch(lo, hi):
        return full.filter(
            (F.col("conv_id") >= f"conv{lo:06d}")
            & (F.col("conv_id") < f"conv{hi:06d}")
        )

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)
    idx.initial_build(batch(0, 8))
    idx.merge_segments(spark)
    srv = WarehouseServer(idx, spark, tombstone_limit=None)

    deleted_log: list[tuple[float, frozenset]] = []
    errors: list[BaseException] = []
    done = threading.Event()

    def writer():
        try:
            for i in range(1, 5):
                idx.ingest(batch(8 * i, 8 * (i + 1)), on_oov="extend")
                conv = f"conv{8 * (i - 1):06d}"
                docmap = spark.read.option(
                    "recursiveFileLookup", "true"
                ).parquet(os.path.join(idx.root, "docmap"))
                ids = frozenset(
                    r["doc_id"]
                    for r in docmap.filter(
                        F.col("conv_id") == conv
                    ).collect()
                )
                idx.delete_conversations(spark, [conv], strict=False)
                deleted_log.append((_t.monotonic(), ids))
                if i % 2 == 0:
                    idx.merge_segments(spark)
                if i % 3 == 0:
                    idx.compact_deltas(spark)
            idx.merge_segments(spark)
        except BaseException as e:  # surfaced in the main thread
            errors.append(e)
        finally:
            done.set()

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    responses = []
    while not done.is_set():
        t0 = _t.monotonic()
        r = srv.query(Q, k=20)
        # capture the state the server answered FROM (same refresh
        # cycle as the response)
        responses.append((t0, srv.snapshot_id, srv._exclude, r))
    th.join(timeout=600)
    assert not errors, errors
    assert len(responses) >= 5  # the soak actually interleaved

    # safety: a delete that COMPLETED before the query began must be
    # suppressed in that query's response
    for t0, _sid, _excl, r in responses:
        must_exclude = set()
        for tc, ids in deleted_log:
            if tc < t0:
                must_exclude |= ids
        assert not any(d in must_exclude for _, _, d, _ in r)

    # consistency: each response is exactly the serve result over the
    # snapshot + exclude set it reports — the cache never drifted from
    # the committed snapshot it claims to serve
    from flame_spark.pipeline import wand_bm25_serve
    from flame_spark.wand import segments_for_serving
    from types import SimpleNamespace

    # (query terms are stable across the soak: the formulaic words are
    # in the initial vocabulary, extend-mode only MINTS ids above it,
    # and hash_base is pinned — so the final artifacts replay every
    # response's query identically)
    art = idx.load_serving_artifacts(spark)
    index = SimpleNamespace(cfg=idx.cfg, artifacts=art)
    seen: dict = {}
    for _t0, sid, excl, r in responses:
        key = (sid, None if excl is None else tuple(excl))
        if key in seen:
            assert seen[key] == r, key  # same state -> same answer
            continue
        seen[key] = r
        segs = segments_for_serving(
            idx.warehouse.read_snapshot(spark, sid), 4
        )
        want = wand_bm25_serve(
            Q, index, segs, k=20,
            exclude_docs=None if excl is None else list(excl),
        )
        segs.unpersist()
        assert r == want, sid

    # convergence: the final answer equals a fresh server's over the
    # final merged state
    fresh = WarehouseServer(idx, spark, tombstone_limit=None)
    assert srv.query(Q, k=20) == fresh.query(Q, k=20)
    fresh.close()
    srv.close()
    full.unpersist()


def test_server_dirichlet_family(spark, tmp_path):
    """query_dirichlet serves the second ranking family from the same
    snapshot cache: non-empty and consistent with the direct
    segment-path scorer; a delete is excluded at the NEXT query with
    the dl cache intact; a merge swaps the cached dl table."""
    from flame_spark.pipeline import query_terms_local
    from flame_spark.wand import dirichlet_topk_segments

    full = transcripts_df(spark, 12, 5).persist()
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)
    idx.initial_build(full)
    idx.merge_segments(spark)
    srv = WarehouseServer(idx, spark)

    r1 = srv.query_dirichlet(Q, k=200, mu=500.0)
    assert r1 and all(len(t) == 4 for t in r1)
    # parity with the direct segment path over the served cache
    qterms = query_terms_local(spark, Q, srv._index)
    direct = dirichlet_topk_segments(
        qterms, srv._segments, srv._dl, 500.0, 200
    ).collect()
    assert [(r["query_id"], r["rank"], r["doc_id"], r["score"])
            for r in direct] == r1
    # BM25 and Dirichlet rank the same live docs (different orders
    # allowed): candidate doc sets at full depth coincide
    bm = srv.query(Q, k=200)
    assert {d for _, _, d, _ in r1} == {d for _, _, d, _ in bm}

    # delete the Dirichlet top doc: excluded at the next query, no
    # merge needed, and the dl cache survives (same snapshot)
    import os

    dl_before = srv._dl
    top_doc = next(d for _, rank, d, _ in r1 if rank == 1)
    docmap = spark.read.parquet(os.path.join(idx.root, "docmap"))
    conv = docmap.filter(F.col("doc_id") == top_doc).collect()[0]["conv_id"]
    idx.delete_conversations(spark, [conv])
    deleted = set(idx.deleted_doc_ids(spark).tolist())
    r2 = srv.query_dirichlet(Q, k=200, mu=500.0)
    assert not any(d in deleted for _, _, d, _ in r2)
    assert srv._dl is dl_before

    # merge -> snapshot swap -> dl cache rebuilt lazily
    idx.merge_segments(spark)
    r3 = srv.query_dirichlet(Q, k=200, mu=500.0)
    assert srv._dl is not dl_before
    assert not any(d in deleted for _, _, d, _ in r3)
    assert {d for _, _, d, _ in r2} == {d for _, _, d, _ in r3}
    srv.close()
    assert srv._dl is None
    full.unpersist()


def test_server_time_travel_pin(spark, tmp_path):
    """pin_snapshot serves a fixed committed snapshot while HEAD moves
    on — and deletes filed AFTER the pin still apply to it (the
    forget contract reaches historical reads)."""
    full = transcripts_df(spark, 12, 5).persist()
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)
    idx.initial_build(full.filter(F.col("conv_id") < "conv000006"))
    idx.merge_segments(spark)
    srv = WarehouseServer(idx, spark)
    r_snap1 = srv.query(Q, k=200)
    snap1 = srv.snapshot_id

    idx.ingest(full.filter(F.col("conv_id") >= "conv000006"), on_oov="extend")
    idx.merge_segments(spark)
    r_head = srv.query(Q, k=200)
    assert srv.snapshot_id != snap1
    assert {d for _, _, d, _ in r_head} > {d for _, _, d, _ in r_snap1}

    pinned = WarehouseServer(idx, spark, pin_snapshot=snap1)
    r_pin = pinned.query(Q, k=200)
    assert r_pin == r_snap1  # tuple-identical historical read
    assert pinned.snapshot_id == snap1

    # a delete filed now must vanish from the PINNED read too
    import os

    top_doc = next(d for _, rank, d, _ in r_pin if rank == 1)
    docmap = spark.read.parquet(os.path.join(idx.root, "docmap"))
    conv = docmap.filter(F.col("doc_id") == top_doc).collect()[0]["conv_id"]
    idx.delete_conversations(spark, [conv])
    deleted = set(idx.deleted_doc_ids(spark).tolist())
    r_pin2 = pinned.query(Q, k=200)
    assert not any(d in deleted for _, _, d, _ in r_pin2)
    assert pinned.snapshot_id == snap1

    # unknown pin fails loudly at the first query
    bad = WarehouseServer(idx, spark, pin_snapshot="no-such-snapshot")
    with pytest.raises(FileNotFoundError):
        bad.query(Q)
    pinned.close()
    srv.close()
    full.unpersist()
