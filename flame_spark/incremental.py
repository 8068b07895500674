"""Incremental index maintenance: stream-append new transcript turns,
merge into segments IDENTICAL to a full rebuild.

The expensive 70% of an index build is the scan side (normalize,
tokenize, shingle, TF). Appends should never pay it again for old
docs, so the warehouse persists the scan side's OUTPUT per ingest
batch and re-derives everything downstream at merge time:

  warehouse/
    artifacts.json            pinned normalize/tokenizer artifacts
    state.json                next_doc_id + ingest counter + cfg bits
    doclens/ingest=N/         (doc_id, dl)        every filtered-in doc
    postings/ingest=N/        (term, doc_id, tf, dl)
    segments/shard=NN/        merged block-max segments (idempotent
                              per-shard overwrite via SegmentWarehouse)

Merge = union the delta postings (cheap columnar scan), recompute the
GLOBAL stats (df, N, avgdl — these legitimately change on every
append, so stored per-posting scores must be re-derived, not reused),
re-score with the same np.log fold, re-encode shards. The result is
byte-identical to building from scratch on the union corpus
(tests/test_incremental.py) — the merge just skips the re-scan.

Append contract (asserted): new conv_ids sort AFTER every ingested
conv_id (time-ordered conversation ids), so incrementally-assigned
dense doc ids equal the full-rebuild global sort order. Artifacts are
PINNED from the initial build (a production incremental index never
retrains its tokenizer mid-stream): out-of-vocabulary tokens either
refuse the batch (strict default) or drop from the LNO windows —
the reference's own unknown-token semantics (flame.py:686-687). The
byte-equality target is therefore a pinned-artifact full rebuild
(pipeline.build_index(..., artifacts=...)); a retraining rebuild
changes the feature space by design.

Streaming tie-in: ``ingest_stream`` wires a Structured Streaming file
source through ``foreachBatch`` into ``ingest`` — the canonical
stream -> incremental-index shape ("new Iceberg snapshot -> delta
postings -> shard merge").
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .artifacts_io import load_artifacts, save_artifacts
from .config import FlameConfig
from .corpus import CorpusArtifacts, add_doc_id, add_features, prepare_docs
from .lineage import SegmentWarehouse
from .postings import (
    CorpusStats,
    build_postings,
    corpus_stats,
    doc_lengths,
    term_stats,
)

TRANSCRIPT_KEY = ["conv_id", "turn_idx"]


class IncrementalIndexer:
    def __init__(self, root: str, cfg: FlameConfig):
        self.root = root
        self.cfg = cfg
        self.warehouse = SegmentWarehouse(root)
        os.makedirs(root, exist_ok=True)

    # -- paths / state ------------------------------------------------------

    @property
    def state_path(self) -> str:
        return os.path.join(self.root, "state.json")

    @property
    def artifacts_path(self) -> str:
        return os.path.join(self.root, "artifacts.json")

    def _postings_dir(self, ingest: int) -> str:
        return os.path.join(self.root, "postings", f"ingest={ingest}")

    def _doclens_dir(self, ingest: int) -> str:
        return os.path.join(self.root, "doclens", f"ingest={ingest}")

    def _load_state(self) -> dict:
        with open(self.state_path, encoding="utf-8") as f:
            return json.load(f)

    def _save_state(self, state: dict) -> None:
        with open(self.state_path, "w", encoding="utf-8") as f:
            json.dump(state, f)

    # -- build / ingest -----------------------------------------------------

    def initial_build(self, raw: DataFrame) -> None:
        """raw(conv_id, turn_idx, text, ...) -> artifacts + ingest 0."""
        tdf = add_doc_id(raw, TRANSCRIPT_KEY).select("doc_id", "text")
        docs, artifacts = prepare_docs(tdf, self.cfg)
        if artifacts.encoder is None:
            raise ValueError(
                "incremental indexer requires a collected encoder "
                "(raise cfg.max_collect_vocab)"
            )
        save_artifacts(artifacts, self.artifacts_path)
        agg = raw.agg(
            F.max("conv_id").alias("m"), F.count("*").alias("n")
        ).collect()[0]
        self._write_ingest(docs, artifacts, 0)
        # doc ids are assigned over RAW rows (before the min-length
        # filter), exactly like the full-rebuild path — the offset must
        # therefore advance by the raw row count
        self._save_state(
            {"next_doc_id": int(agg["n"]), "n_ingests": 1, "max_conv_id": agg["m"]}
        )

    def ingest(self, new_raw: DataFrame, on_oov: str = "error") -> int:
        """Append new conversations; returns the ingest number.

        Enforces the append contract (conv ids after the watermark).
        ``on_oov``: tokens outside the pinned vocabulary either refuse
        the batch ("error", the strict default — the operator decides
        between dropping and a retrain+rebuild) or drop from the LNO
        windows ("drop" — the reference's own unknown-token semantics,
        flame.py:686-687, and what a production pinned tokenizer does).
        """
        if on_oov not in ("error", "drop"):
            raise ValueError(f"on_oov must be 'error' or 'drop', got {on_oov!r}")
        state = self._load_state()
        artifacts = load_artifacts(self.artifacts_path)
        low = new_raw.agg(F.min("conv_id").alias("m")).collect()[0]["m"]
        if low is None:
            return state["n_ingests"] - 1  # empty batch
        if state["max_conv_id"] is not None and low <= state["max_conv_id"]:
            raise ValueError(
                f"append contract violated: new conv_id {low!r} <= "
                f"ingested watermark {state['max_conv_id']!r}"
            )
        tdf = add_doc_id(new_raw, TRANSCRIPT_KEY).select("doc_id", "text")
        tdf = tdf.withColumn(
            "doc_id", F.col("doc_id") + F.lit(int(state["next_doc_id"]))
        )
        docs, _ = prepare_docs(tdf, self.cfg, artifacts)
        if on_oov == "error":
            self._check_vocab_closure(docs, artifacts)
        ingest_no = state["n_ingests"]
        self._write_ingest(docs, artifacts, ingest_no)
        agg = new_raw.agg(
            F.max("conv_id").alias("m"), F.count("*").alias("n")
        ).collect()[0]
        state["next_doc_id"] = int(state["next_doc_id"]) + int(agg["n"])
        state["n_ingests"] = ingest_no + 1
        state["max_conv_id"] = max(state["max_conv_id"], agg["m"])
        self._save_state(state)
        return ingest_no

    def _check_vocab_closure(
        self, docs: DataFrame, artifacts: CorpusArtifacts
    ) -> None:
        """Refuse batches with tokens outside the pinned vocabulary
        (strict mode): anti-join against the vocab — distributed, the
        vocab df is one createDataFrame of the O(vocab) driver-held
        strings the pinned artifacts already hold."""
        vocab_df = docs.sparkSession.createDataFrame(
            [(t,) for t in artifacts.encoder], "tok string"
        )
        oov = (
            docs.select(F.explode("tokens").alias("tok"))
            .distinct()
            .join(vocab_df, "tok", "left_anti")
            .limit(5)
            .collect()
        )
        if oov:
            raise ValueError(
                "vocabulary-extending append (new tokens "
                f"{[r['tok'] for r in oov]}); retrain+rebuild, or pass "
                "on_oov='drop' to index with the pinned vocabulary"
            )

    def _write_ingest(
        self, docs: DataFrame, artifacts: CorpusArtifacts, ingest_no: int
    ) -> int:
        cfg = self.cfg
        feat = add_features(docs, artifacts, cfg).persist()
        dl = doc_lengths(feat, "features").persist()
        dl.write.mode("overwrite").parquet(self._doclens_dir(ingest_no))
        postings = build_postings(feat, "features")
        postings.join(dl, "doc_id").select(
            "term", "doc_id", "tf", "dl"
        ).write.mode("overwrite").parquet(self._postings_dir(ingest_no))
        n_new = dl.count()
        feat.unpersist()
        dl.unpersist()
        return n_new

    # -- merge --------------------------------------------------------------

    def merged_inputs(self, spark: SparkSession):
        """-> (postings_dl, term_stats_df, stats) over ALL ingests."""
        postings_dl = spark.read.parquet(os.path.join(self.root, "postings"))
        doclens = spark.read.parquet(os.path.join(self.root, "doclens"))
        stats = corpus_stats(doclens)
        stats_df = term_stats(postings_dl.select("term", "doc_id", "tf"))
        return postings_dl, stats_df, stats

    def merge_segments(self, spark: SparkSession) -> DataFrame:
        """Union all delta postings, re-score against the refreshed
        global stats, re-encode every shard (idempotent per-shard
        overwrite + lineage via SegmentWarehouse). Returns the merged
        segment table. Byte-identical to a from-scratch build on the
        union corpus (tested)."""
        from .lineage import snapshot_id
        from .segments import postings_with_scores

        cfg = self.cfg
        postings_dl, stats_df, stats = self.merged_inputs(spark)
        scored = postings_with_scores(
            postings_dl, stats_df, stats, cfg.bm25_k1, cfg.bm25_b
        )
        snap = snapshot_id(postings_dl, ["term", "doc_id", "tf"])
        self.warehouse.build_checkpointed(
            scored, stats.n_docs, cfg.n_shards, cfg.block_size, snap
        )
        return self.warehouse.read_segments(spark)


def ingest_stream(
    indexer: IncrementalIndexer,
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    on_oov: str = "error",
):
    """Structured Streaming file source -> foreachBatch -> ingest: each
    microbatch of new transcript files becomes one ingest delta. Driven
    to completion with processAllAvailable (test mode); in production
    the same query runs continuously and merge_segments is scheduled
    per N ingests."""
    from .streaming import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        indexer.ingest(batch_df, on_oov=on_oov)

    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    q.processAllAvailable()
    q.stop()
