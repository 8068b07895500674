"""Incremental segment merge: stream-append new conversations, merge,
and the warehouse segments must be BYTE-IDENTICAL to a full rebuild on
the union corpus."""

import pytest
from pyspark.sql import functions as F

from flame_spark.config import FlameConfig
from flame_spark.corpus import add_doc_id
from flame_spark.data import transcripts_df
from flame_spark.incremental import IncrementalIndexer, ingest_stream
from flame_spark.pipeline import build_index, build_segment_table

CFG = FlameConfig(
    ngram=3, n_out=1, min_text_length=80, tokenizer="word",
    term_mode="lno", n_shards=5, block_size=4,
)


def _seg_map(rows):
    return {
        (int(r["shard"]), r["term"]): (
            r["n_docs"], r["first_doc"], r["last_doc"],
            bytes(r["doc_deltas"]), bytes(r["tfs"]), bytes(r["scores"]),
            tuple(r["block_max"]),
        )
        for r in rows
    }


def test_stream_append_merge_equals_full_rebuild(spark, tmp_path):
    full = transcripts_df(spark, 20, 8).persist()
    initial = full.filter(F.col("conv_id") < "conv000012")
    append1 = full.filter(
        (F.col("conv_id") >= "conv000012") & (F.col("conv_id") < "conv000016")
    )
    append2 = full.filter(F.col("conv_id") >= "conv000016")
    assert append1.count() > 0 and append2.count() > 0

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(initial)

    # generation 2: direct batch append. The generator's perturbed
    # words guarantee novel tokens, so this exercises the pinned-vocab
    # drop path (reference OOV semantics).
    idx.ingest(append1, on_oov="drop")

    # generation 3: stream-append — stage the new conversations as
    # files, drive the foreachBatch ingestion to completion
    stream_dir = tmp_path / "incoming"
    append2.repartition(2).write.mode("overwrite").parquet(str(stream_dir))
    ingest_stream(idx, spark, str(stream_dir), str(tmp_path / "ckpt"),
                  on_oov="drop")
    merged = _seg_map(idx.merge_segments(spark).collect())

    # twin: full rebuild through the GENERAL pipeline with the same
    # pinned artifacts — independent machinery (postings/stats joins +
    # JVM scoring) must yield byte-identical segments
    from flame_spark.artifacts_io import load_artifacts

    pinned = load_artifacts(idx.artifacts_path)
    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        CFG, artifacts=pinned,
    )
    rebuilt = _seg_map(build_segment_table(rebuilt_index).collect())

    assert merged == rebuilt
    assert len(merged) > 50
    full.unpersist()


def test_extend_ingest_merge_equals_full_rebuild(spark, tmp_path):
    """OOV-TOLERANT ingest (on_oov='extend'): appended batches mint ids
    for unseen tokens above the pinned range; the merged index must be
    byte-identical to a full rebuild over the union with the FINAL
    extended vocabulary + pinned hash base."""
    full = transcripts_df(spark, 20, 8).persist()
    initial = full.filter(F.col("conv_id") < "conv000012")
    append1 = full.filter(
        (F.col("conv_id") >= "conv000012") & (F.col("conv_id") < "conv000016")
    )
    append2 = full.filter(F.col("conv_id") >= "conv000016")

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)
    idx.initial_build(initial)
    v0 = idx._load_state()["n_vocab"]
    idx.ingest(append1, on_oov="extend")
    v1 = idx._load_state()["n_vocab"]
    assert v1 > v0, "generator's perturbed words must mint new tokens"
    idx.ingest(append2, on_oov="extend")
    assert idx._load_state()["n_vocab"] > v1
    merged = _seg_map(idx.merge_segments(spark).collect())

    pinned = idx.load_serving_artifacts(spark)
    assert pinned.hash_base == 2**32
    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        CFG, artifacts=pinned,
    )
    rebuilt = _seg_map(build_segment_table(rebuilt_index).collect())
    assert merged == rebuilt
    assert len(merged) > 50
    full.unpersist()


def test_extend_ingest_joined_encoder_mode(spark, tmp_path):
    """Unbounded-vocabulary warehouses (vocab > max_collect_vocab, so
    no collected dict ever exists) must support extend-ingest end to
    end through the joined-encoder path, byte-equal to a pinned full
    rebuild."""
    from dataclasses import replace

    cfg = replace(CFG, max_collect_vocab=10)
    full = transcripts_df(spark, 12, 6).persist()
    initial = full.filter(F.col("conv_id") < "conv000008")
    append = full.filter(F.col("conv_id") >= "conv000008")

    idx = IncrementalIndexer(str(tmp_path / "wh"), cfg)
    idx.initial_build(initial)
    from flame_spark.artifacts_io import load_artifacts

    assert load_artifacts(idx.artifacts_path).encoder is None  # joined mode
    idx.ingest(append, on_oov="extend")
    merged = _seg_map(idx.merge_segments(spark).collect())

    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        cfg, artifacts=idx.load_serving_artifacts(spark),
    )
    rebuilt = _seg_map(build_segment_table(rebuilt_index).collect())
    assert merged == rebuilt
    full.unpersist()


def test_collected_encoder_spills_to_joined_on_extend(spark, tmp_path):
    """A warehouse that STARTS collected but outgrows max_collect_vocab
    on an extending ingest must permanently switch to the parquet vocab
    table (JSON encoder nulled) and stay correct."""
    from dataclasses import replace

    from flame_spark.artifacts_io import load_artifacts

    full = transcripts_df(spark, 12, 6).persist()
    initial = full.filter(F.col("conv_id") < "conv000008")
    append = full.filter(F.col("conv_id") >= "conv000008")

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(initial)
    art0 = load_artifacts(idx.artifacts_path)
    assert art0.encoder is not None
    # shrink the cap below what the extension will need
    idx.cfg = replace(CFG, max_collect_vocab=art0.n_vocab + 1)
    idx.ingest(append, on_oov="extend")
    assert load_artifacts(idx.artifacts_path).encoder is None
    merged = _seg_map(idx.merge_segments(spark).collect())

    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        CFG, artifacts=idx.load_serving_artifacts(spark),
    )
    rebuilt = _seg_map(build_segment_table(rebuilt_index).collect())
    assert merged == rebuilt
    full.unpersist()


def test_empty_initial_build_rejected(spark, tmp_path):
    raw = transcripts_df(spark, 4, 4).filter(F.lit(False))
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    with pytest.raises(ValueError, match="empty corpus"):
        idx.initial_build(raw)


def test_merge_is_idempotent_and_resumable(spark, tmp_path):
    """Re-merging with no new ingests must not duplicate or change
    anything (lineage skips completed shards for the same snapshot)."""
    raw = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    first = _seg_map(idx.merge_segments(spark).collect())
    again = _seg_map(idx.merge_segments(spark).collect())
    assert first == again


def test_append_contract_violations(spark, tmp_path):
    raw = transcripts_df(spark, 10, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw.filter(F.col("conv_id") < "conv000008"))

    # out-of-order conv_id (already ingested range) -> refuse
    with pytest.raises(ValueError, match="append contract"):
        idx.ingest(raw.filter(F.col("conv_id") < "conv000003"))

    # vocabulary-extending append -> refuse loudly
    novel = spark.createDataFrame(
        [("conv999999", 0, "user",
          "zzznovelword " * 30 + "completely unseen tokenzz " * 10,
          None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    with pytest.raises(ValueError, match="vocabulary-extending"):
        idx.ingest(novel)


def test_delete_merge_equals_pinned_rebuild_on_survivors(spark, tmp_path):
    """Right-to-be-forgotten: tombstoned conversations vanish from the
    merged index — df/N/avgdl shrink, survivors re-score — and the
    result is byte-identical to a pinned-artifact rebuild over the
    survivors with their ORIGINAL (now sparse) doc ids."""
    full = transcripts_df(spark, 20, 8).persist()
    initial = full.filter(F.col("conv_id") < "conv000012")
    append = full.filter(F.col("conv_id") >= "conv000012")
    gone = ["conv000003", "conv000007", "conv000015"]

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG, hash_base=2**32)
    idx.initial_build(initial)
    idx.ingest(append, on_oov="extend")
    n_del = idx.delete_conversations(spark, gone)
    assert n_del > 0
    # idempotent: re-deleting tombstones nothing new
    assert idx.delete_conversations(spark, gone) == 0
    merged = _seg_map(idx.merge_segments(spark).collect())

    # twin: pinned artifacts, pinned ids (assigned over the FULL raw
    # stream, then the deleted convs dropped -> id space has holes)
    pinned = idx.load_serving_artifacts(spark)
    survivors = (
        add_doc_id(full, ["conv_id", "turn_idx"])
        .filter(~F.col("conv_id").isin(gone))
        .select("doc_id", "text")
    )
    rebuilt_index = build_index(survivors, CFG, artifacts=pinned)
    rebuilt = _seg_map(build_segment_table(rebuilt_index).collect())
    assert merged == rebuilt
    assert len(merged) > 50

    full.unpersist()


def test_delete_unknown_conv_strict_vs_lenient(spark, tmp_path):
    raw = transcripts_df(spark, 6, 5)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    with pytest.raises(ValueError, match="unknown conv_ids"):
        idx.delete_conversations(spark, ["conv000002", "convNOPE"])
    # lenient mode ignores the unknown id, deletes the known one
    assert idx.delete_conversations(
        spark, ["conv000002", "convNOPE"], strict=False
    ) > 0


def test_delete_then_snapshot_history(spark, tmp_path):
    """Each merge (pre- and post-delete) is its own snapshot: the
    pre-delete index stays time-travelable until expired."""
    raw = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    before = _seg_map(idx.merge_segments(spark).collect())
    sid_before = idx.warehouse.snapshot_log.current_id()
    idx.delete_conversations(spark, ["conv000001"])
    after = _seg_map(idx.merge_segments(spark).collect())
    assert after != before
    assert idx.warehouse.snapshot_log.current_id() != sid_before
    assert (
        _seg_map(idx.warehouse.read_snapshot(spark, sid_before).collect())
        == before
    )


def test_delete_is_immediately_serveable(spark, tmp_path):
    """Between a delete and the next merge, serving must already
    suppress the tombstoned docs: pass ``deleted_doc_ids`` as the
    exclude set (live-docs semantics). After the merge the exclusion
    is baked into the index itself."""
    import os

    from flame_spark.fastbuild import ServingIndex
    from flame_spark.pipeline import wand_bm25_topk

    raw = transcripts_df(spark, 10, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    segs = idx.merge_segments(spark)
    art = idx.load_serving_artifacts(spark)
    _, _, stats = idx.merged_inputs(spark)
    serving = ServingIndex(cfg=CFG, artifacts=art, stats=stats, segments=segs)
    q = [{"query_id": "q0",
          "query_text": "in nomine sancte et individue trinitatis amen"}]
    base = wand_bm25_topk(spark, q, serving, segs, k=5).collect()
    assert base, "formulaic query must match the fixture corpus"
    top_doc = next(r["doc_id"] for r in base if r["rank"] == 1)

    docmap = spark.read.parquet(os.path.join(idx.root, "docmap"))
    conv = next(
        r["conv_id"] for r in docmap.filter(F.col("doc_id") == top_doc).collect()
    )
    assert idx.delete_conversations(spark, [conv]) > 0
    excl = idx.deleted_doc_ids(spark)
    assert top_doc in set(excl.tolist())

    # pre-merge: exclusion suppresses the deleted conv's docs at serve
    after = wand_bm25_topk(
        spark, q, serving, segs, k=5, exclude_docs=excl
    ).collect()
    deleted = set(excl.tolist())
    assert after and not any(r["doc_id"] in deleted for r in after)
    assert [r["rank"] for r in after] == list(range(1, len(after) + 1))

    # post-merge: the index itself no longer contains the docs
    merged = idx.merge_segments(spark)
    serving2 = ServingIndex(
        cfg=CFG, artifacts=art, stats=stats, segments=merged
    )
    final = wand_bm25_topk(spark, q, serving2, merged, k=5).collect()
    assert final and not any(r["doc_id"] in deleted for r in final)


def test_purge_tombstones_physical_erasure(spark, tmp_path):
    """After purge, NO delta table mentions the deleted docs, the
    tombstone table itself is gone, and a re-merge is a no-op commit
    (identical snapshot): the logical filter and the physical purge
    produce the same postings content by construction."""
    import os

    raw = transcripts_df(spark, 10, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    gone = ["conv000002", "conv000005"]
    assert idx.delete_conversations(spark, gone) > 0
    deleted = set(idx.deleted_doc_ids(spark).tolist())
    before = _seg_map(idx.merge_segments(spark).collect())
    sid = idx.warehouse.snapshot_log.current_id()

    n = idx.purge_tombstones(spark)
    assert n == len(deleted)
    assert not os.path.isdir(idx.tombstones_dir)
    assert idx.deleted_doc_ids(spark).size == 0
    for kind in ("postings", "doclens", "docmap"):
        df = spark.read.parquet(os.path.join(idx.root, kind))
        assert df.filter(F.col("doc_id").isin(list(deleted))).count() == 0
    docmap = spark.read.parquet(os.path.join(idx.root, "docmap"))
    assert docmap.filter(F.col("conv_id").isin(gone)).count() == 0

    # identical postings content -> same snapshot id, same segments
    after = _seg_map(idx.merge_segments(spark).collect())
    assert after == before
    assert idx.warehouse.snapshot_log.current_id() == sid

    # idempotent: purging again is a no-op
    assert idx.purge_tombstones(spark) == 0


def test_purge_crash_recovery(spark, tmp_path):
    """A swap interrupted mid-purge (leftover .old / .new dirs) must
    roll back to a consistent state on the next purge call."""
    import os
    import shutil

    raw = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw)
    idx.delete_conversations(spark, ["conv000001"])
    expected = _seg_map(idx.merge_segments(spark).collect())

    # simulate the worst crash window: X gone, X.old + X.new both left
    base = os.path.join(idx.root, "postings")
    d = os.path.join(base, "ingest=0")
    shutil.copytree(d, d + ".new")
    os.rename(d, d + ".old")
    assert not os.path.isdir(d)

    n = idx.purge_tombstones(spark)  # recovers, then purges
    assert n > 0
    assert os.path.isdir(d)
    assert not os.path.isdir(d + ".old") and not os.path.isdir(d + ".new")
    again = _seg_map(idx.merge_segments(spark).collect())
    assert again == expected


def test_compact_deltas_preserves_merge(spark, tmp_path):
    """Compacting many ingest generations into one rollup leaves the
    postings content — and so the merge snapshot — identical, while
    collapsing the per-ingest dir sprawl."""
    import os

    full = transcripts_df(spark, 12, 6).persist()
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(full.filter(F.col("conv_id") < "conv000006"))
    idx.ingest(
        full.filter(
            (F.col("conv_id") >= "conv000006") & (F.col("conv_id") < "conv000009")
        ),
        on_oov="extend",
    )
    idx.ingest(full.filter(F.col("conv_id") >= "conv000009"), on_oov="extend")
    before = _seg_map(idx.merge_segments(spark).collect())
    sid = idx.warehouse.snapshot_log.current_id()

    removed = idx.compact_deltas(spark)
    assert removed > 0
    for kind in ("postings", "doclens", "docmap", "vocab"):
        gens = [
            d for d in os.listdir(os.path.join(idx.root, kind))
            if d.startswith("ingest=") or d.startswith("compact-")
        ]
        assert gens == ["compact-0"], (kind, gens)

    after = _seg_map(idx.merge_segments(spark).collect())
    assert after == before
    assert idx.warehouse.snapshot_log.current_id() == sid

    # another ingest + delete + purge keep working on the compacted
    # layout (purge must rewrite compact dirs too)
    more = transcripts_df(spark, 14, 6).filter(F.col("conv_id") >= "conv000012")
    idx.ingest(more, on_oov="extend")
    assert idx.delete_conversations(spark, ["conv000001"]) > 0
    merged = _seg_map(idx.merge_segments(spark).collect())
    assert idx.purge_tombstones(spark) > 0
    assert _seg_map(idx.merge_segments(spark).collect()) == merged
    full.unpersist()


def test_compact_crash_recovery_both_directions(spark, tmp_path):
    import json
    import os
    import shutil

    raw = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG)
    idx.initial_build(raw.filter(F.col("conv_id") < "conv000005"))
    idx.ingest(raw.filter(F.col("conv_id") >= "conv000005"), on_oov="extend")
    expected = _seg_map(idx.merge_segments(spark).collect())
    base = os.path.join(idx.root, "postings")
    gens = sorted(d for d in os.listdir(base) if d.startswith("ingest="))

    # ROLLBACK window: marker written, gens moved aside, dest not yet in
    marker = os.path.join(base, ".compact.pending")
    with open(marker, "w") as f:
        json.dump({"dest": "compact-0", "gens": gens}, f)
    os.makedirs(os.path.join(base, "compact-0.new"))
    for g in gens:
        os.rename(os.path.join(base, g), os.path.join(base, g + ".old"))
    idx._recover_purge()
    assert sorted(
        d for d in os.listdir(base) if d.startswith("ingest=")
    ) == gens
    assert not os.path.exists(marker)
    assert _seg_map(idx.merge_segments(spark).collect()) == expected

    # ROLL-FORWARD window: dest in place, .old gens + marker left over
    n = idx.compact_deltas(spark)  # counts dirs across all four tables
    assert n >= len(gens)
    # simulate the crash: fabricate .old leftovers + marker post-commit
    with open(marker, "w") as f:
        json.dump({"dest": "compact-0", "gens": gens}, f)
    for g in gens:
        os.makedirs(os.path.join(base, g + ".old"))
    idx._recover_purge()
    assert not os.path.exists(marker)
    assert not any(d.endswith(".old") for d in os.listdir(base))
    assert _seg_map(idx.merge_segments(spark).collect()) == expected


CFG0 = FlameConfig(
    ngram=3, n_out=1, min_text_length=0, tokenizer="word",
    term_mode="lno", n_shards=5, block_size=4,
)


def test_zero_feature_ingest_changes_merge_snapshot(spark, tmp_path):
    """A batch of docs SHORTER than the ngram window adds zero posting
    rows but still changes N/avgdl — the merge must commit a NEW
    snapshot with re-derived scores (a postings-only identity would
    declare it idempotent and serve stale stats), and stay byte-equal
    to a pinned rebuild over the union."""
    base = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG0, hash_base=2**32)
    idx.initial_build(base)
    before = _seg_map(idx.merge_segments(spark).collect())
    sid1 = idx.warehouse.snapshot_log.current_id()

    shorties = spark.createDataFrame(
        [(f"convz{i:04d}", 0, "user", "ok go", None, None)
         for i in range(5)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    idx.ingest(shorties, on_oov="extend")
    after = _seg_map(idx.merge_segments(spark).collect())
    assert idx.warehouse.snapshot_log.current_id() != sid1
    assert after != before  # N grew -> every idf/score re-derived

    full = base.unionByName(shorties)
    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        CFG0, artifacts=idx.load_serving_artifacts(spark),
    )
    assert after == _seg_map(build_segment_table(rebuilt_index).collect())


def test_torn_ingest_generation_is_invisible(spark, tmp_path):
    """Dirs of an ingest that never committed state (crash mid-ingest)
    must not be read: a doclens-without-postings orphan would inflate
    N/avgdl silently."""
    import os

    raw = transcripts_df(spark, 8, 6)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG0)
    idx.initial_build(raw)
    expected = _seg_map(idx.merge_segments(spark).collect())
    sid = idx.warehouse.snapshot_log.current_id()

    # fabricate the torn generation: doclens written, postings absent,
    # state not advanced
    orphan = os.path.join(idx.root, "doclens", "ingest=1")
    spark.createDataFrame(
        [(10_000 + i, 99) for i in range(50)], "doc_id long, dl long"
    ).write.parquet(orphan)

    again = _seg_map(idx.merge_segments(spark).collect())
    assert again == expected
    assert idx.warehouse.snapshot_log.current_id() == sid  # no-op commit


def test_stream_replay_does_not_wedge(spark, tmp_path):
    """Re-delivering already-ingested microbatches (at-least-once
    restart with a lost checkpoint) must no-op, not trip the append
    contract."""
    raw = transcripts_df(spark, 8, 5)
    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG0)
    idx.initial_build(raw.filter(F.col("conv_id") < "conv000004"))
    stream_dir = tmp_path / "incoming"
    raw.filter(F.col("conv_id") >= "conv000004").repartition(2).write.mode(
        "overwrite"
    ).parquet(str(stream_dir))
    ingest_stream(idx, spark, str(stream_dir), str(tmp_path / "ck1"),
                  on_oov="drop")
    n = idx._load_state()["n_ingests"]
    # fresh checkpoint -> full redelivery of every file
    ingest_stream(idx, spark, str(stream_dir), str(tmp_path / "ck2"),
                  on_oov="drop")
    assert idx._load_state()["n_ingests"] == n  # skipped, not wedged


def test_extend_offset_survives_stale_state(spark, tmp_path):
    """Crash window: artifacts.json committed with the extended vocab
    but state.json still holds the old n_vocab. The next extend must
    mint ids ABOVE the artifacts' ceiling (no two tokens share an id)
    and the merge must still equal a pinned rebuild."""
    import json as _json

    full = transcripts_df(spark, 16, 6).persist()
    a = full.filter(F.col("conv_id") < "conv000008")
    b = full.filter(
        (F.col("conv_id") >= "conv000008") & (F.col("conv_id") < "conv000012")
    )
    c = full.filter(F.col("conv_id") >= "conv000012")

    idx = IncrementalIndexer(str(tmp_path / "wh"), CFG0, hash_base=2**32)
    idx.initial_build(a)
    v0 = idx._load_state()["n_vocab"]
    idx.ingest(b, on_oov="extend")
    state = idx._load_state()
    assert state["n_vocab"] > v0
    # simulate the crash: roll ONLY the state watermark back
    state["n_vocab"] = v0
    with open(idx.state_path, "w") as f:
        _json.dump(state, f)

    idx.ingest(c, on_oov="extend")
    assert idx._load_state()["n_vocab"] > v0
    # vocabulary must be collision-free
    vocab = idx._vocab_df(spark)
    assert vocab.count() == vocab.select("tid").distinct().count()
    merged = _seg_map(idx.merge_segments(spark).collect())
    rebuilt_index = build_index(
        add_doc_id(full, ["conv_id", "turn_idx"]).select("doc_id", "text"),
        CFG0, artifacts=idx.load_serving_artifacts(spark),
    )
    assert merged == _seg_map(build_segment_table(rebuilt_index).collect())
    full.unpersist()
