"""Live serving over an incremental warehouse: follow snapshot commits
and tombstones automatically.

``WarehouseServer`` wraps the serving read path (wand.segments_for_
serving + pipeline.wand_bm25_serve) with snapshot/tombstone tracking:

- every ``query()`` first resolves the snapshot log's HEAD (one small
  file read); when a merge committed a new snapshot since the last
  query, the old segment cache is swapped out for the new snapshot's
  — queries always serve exactly one committed snapshot, never a
  half-merged state (the log's atomic-visibility guarantee carried
  through to the cache);
- artifacts reload on snapshot swap (an OOV-extend merge grows the
  vocabulary — stale artifacts would drop the new tokens from query
  shingles);
- the tombstone table is watched by file-listing signature: a delete
  becomes visible at the NEXT query as a serve-time exclude set
  (live-docs semantics, wand._wand_shard_kernel) without waiting for
  the merge; the merge (or purge) empties it again.

Scale: the per-query overhead is one stat of HEAD plus one listdir of
the tombstone table — no Spark job unless something changed. The
segment cache swap costs one snapshot read + repartition, amortized
over the queries served between merges.
"""

from __future__ import annotations

import os
from types import SimpleNamespace

import numpy as np

from pyspark.sql import SparkSession

from .incremental import IncrementalIndexer
from .pipeline import wand_bm25_serve
from .wand import segments_for_serving


class WarehouseServer:
    def __init__(
        self,
        indexer: IncrementalIndexer,
        spark: SparkSession,
        n_parts: int | None = None,
    ):
        self.idx = indexer
        self.spark = spark
        self.n_parts = n_parts or max(
            8, int(spark.conf.get("spark.sql.shuffle.partitions")) // 2
        )
        self._snap_id: str | None = None
        self._segments = None
        self._index = None
        self._tomb_sig: tuple | None = None
        self._exclude: np.ndarray | None = None

    # -- state tracking -----------------------------------------------------

    def _tombstone_signature(self) -> tuple | None:
        d = self.idx.tombstones_dir
        if not os.path.isdir(d):
            return None
        entries = []
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            try:
                entries.append((f, os.path.getmtime(p), os.path.getsize(p)))
            except FileNotFoundError:
                pass  # concurrent writer; next query re-lists
        return tuple(entries)

    def refresh(self) -> bool:
        """Sync with the warehouse; returns True if anything swapped.

        Ordering matters against a CONCURRENT merge: the tombstone
        signature is read BEFORE HEAD. A merge commits the new snapshot
        and then clears the tombstones; reading HEAD first could pair
        the OLD snapshot with the post-merge EMPTY exclude set —
        transiently resurrecting deleted docs. Tombstones-first can
        only pair a stale (over-inclusive) exclude set with a newer
        snapshot, which is harmless: excluding an already-removed doc
        is a no-op."""
        changed = False
        sig = self._tombstone_signature()
        if sig != self._tomb_sig:
            try:
                self._exclude = (
                    self.idx.deleted_doc_ids(self.spark) if sig else None
                )
            except Exception:
                # concurrent delete_conversations append: footer-less
                # in-flight part files fail the read — keep the previous
                # exclude set (over-inclusion is safe) and re-list next
                # query
                sig = self._tomb_sig
            if self._exclude is not None and self._exclude.size == 0:
                self._exclude = None
            self._tomb_sig = sig
            changed = True
        head = self.idx.warehouse.snapshot_log.current_id()
        if head is None:
            raise RuntimeError(
                "WarehouseServer: no committed snapshot (merge first)"
            )
        if head != self._snap_id:
            segments = self.idx.warehouse.read_snapshot(self.spark, head)
            sharded = segments_for_serving(segments, self.n_parts)
            if self._segments is not None:
                self._segments.unpersist()
            self._segments = sharded
            self._index = SimpleNamespace(
                cfg=self.idx.cfg,
                artifacts=self.idx.load_serving_artifacts(self.spark),
            )
            self._snap_id = head
            changed = True
        return changed

    # -- queries ------------------------------------------------------------

    @property
    def snapshot_id(self) -> str | None:
        return self._snap_id

    def query(self, queries: list[dict], k: int = 10) -> list[tuple]:
        """[(query_id, rank, doc_id, score), ...] over the CURRENT
        committed snapshot, minus tombstoned docs."""
        self.refresh()
        return wand_bm25_serve(
            queries, self._index, self._segments, k=k,
            exclude_docs=self._exclude,
        )

    def close(self) -> None:
        if self._segments is not None:
            self._segments.unpersist()
            self._segments = None
            self._snap_id = None
