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
