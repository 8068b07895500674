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
  the merge. The exclude set is SNAPSHOT-RELATIVE: a merge records the
  tombstone files it folded in (``folded_tombstones`` in the snapshot
  summary), so serving a post-merge snapshot excludes only deletes
  SINCE that merge — the set is bounded by the delete rate between
  merges, never the warehouse's whole delete history. (The tombstone
  *table* itself persists until ``purge_tombstones`` physically
  erases the rows; merge must not clear it, or a later re-merge over
  the delta dirs would resurrect the deleted docs.)
- ``tombstone_limit`` hard-caps the exclude set: every query ships it
  to the scorers and ``np.isin``-scans it per shard, so an unmerged
  bulk forget-batch of millions of ids would tax every query. Past
  the cap the server either refuses (``on_backlog="error"``, default
  — the operator must merge) or runs the merge itself
  (``on_backlog="merge"``), after which the exclude set collapses to
  the deletes that raced the merge.

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
from .pipeline import wand_bm25_serve, wand_bm25_serve_batch
from .wand import segments_for_serving


#: refresh() pins the exclude set under this instead of the real
#: tombstone-listing signature when a tolerant read had to skip a
#: file: the sentinel compares unequal to every real listing tuple
#: (and to None), so the next query recomputes unconditionally.
_DIRTY_SIG = ("__tombstone_read_incomplete__",)


class TombstoneBacklogError(RuntimeError):
    """Unmerged tombstones exceed the server's ``tombstone_limit`` —
    run ``merge_segments`` (or construct the server with
    ``on_backlog="merge"``) to fold them into the segments."""


class WarehouseServer:
    def __init__(
        self,
        indexer: IncrementalIndexer,
        spark: SparkSession,
        n_parts: int | None = None,
        tombstone_limit: int | None = 1_000_000,
        on_backlog: str = "error",
        pin_snapshot: str | None = None,
    ):
        if on_backlog not in ("error", "merge"):
            raise ValueError(
                f"on_backlog must be 'error' or 'merge', got {on_backlog!r}"
            )
        self.idx = indexer
        self.spark = spark
        self.n_parts = n_parts or max(
            8, int(spark.conf.get("spark.sql.shuffle.partitions")) // 2
        )
        self.tombstone_limit = tombstone_limit
        self.on_backlog = on_backlog
        #: time travel: serve THIS committed snapshot instead of
        #: following HEAD. Deletes filed after the pin apply to pinned
        #: reads WHILE the tombstone table holds them (the exclude set
        #: is computed against the pinned snapshot's
        #: folded_tombstones). Full-erasure forgetting is
        #: purge_tombstones' job: its default expire_old_snapshots=True
        #: expires pre-delete snapshots so stale pins fail loudly;
        #: purging with expire_old_snapshots=False KEEPS time travel at
        #: the documented cost that retained pre-delete snapshots can
        #: still serve the purged docs. Artifacts are the warehouse's
        #: current (append-only, hash-base-pinned) model, a superset of
        #: the pinned snapshot's vocabulary. Note the exclude set of a
        #: long-lived pin grows with ALL deletes since the pin (no
        #: merge can fold them into a frozen snapshot).
        self.pin_snapshot = pin_snapshot
        self._snap_id: str | None = None
        self._segments = None
        self._index = None
        self._tomb_sig: tuple | None = None
        self._exclude: np.ndarray | None = None
        #: (doc_id, dl) reconstructed from the served snapshot's
        #: segments, built lazily on the first Dirichlet query and
        #: invalidated on snapshot swap; _c is its token-count total
        self._dl = None
        self._c: float | None = None

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

    def refresh(self, _retried: bool = False) -> bool:
        """Sync with the warehouse; returns True if anything swapped.

        The exclude set is computed AGAINST the snapshot being served:
        tombstone files listed in that snapshot's ``folded_tombstones``
        summary are already rebuilt out of its segments and need no
        exclusion, so only post-merge deletes ship to the scorers.

        Ordering against a CONCURRENT merge: the tombstone signature is
        read BEFORE HEAD. A merge pins its tombstone listing, commits,
        and records that listing as folded; reading tombstones first
        means the exclude computation can only see a listing at-or-
        before the one the committed HEAD folded — the subtraction then
        leaves the post-merge deletes (correct) or a stale over-
        inclusive superset (harmless: excluding an already-removed doc
        is a no-op). Reading HEAD first could pair an OLD snapshot with
        a folded list from a NEWER merge, under-excluding."""
        changed = False
        sig = self._tombstone_signature()
        if self.pin_snapshot is not None:
            head = self.pin_snapshot
            # fail loudly on an unknown/expired pin before any query
            self.idx.warehouse.snapshot_log.manifest(head)
        else:
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
            if self._dl is not None:
                self._dl.unpersist()
                self._dl = None
                self._c = None
            self._segments = sharded
            self._index = SimpleNamespace(
                cfg=self.idx.cfg,
                artifacts=self.idx.load_serving_artifacts(self.spark),
            )
            snap_swapped = True
            self._snap_id = head
            changed = True
        else:
            snap_swapped = False
        if sig != self._tomb_sig or snap_swapped:
            dropped: list = []
            try:
                # tolerant: a concurrent delete's still-writing part
                # file must not hide OTHER deletes that already
                # completed — per-file fallback reads every readable
                # file, so a completed delete is excluded at this very
                # query (the documented guarantee); the in-flight
                # file's deletes become visible once its (size, mtime)
                # flips the signature
                if sig:
                    excl, dropped = self.idx.serve_exclude_ids(
                        self.spark, head, tolerant=True, with_dropped=True
                    )
                else:
                    excl = None
            except Exception:
                # last resort (e.g. the tombstone dir vanished under a
                # concurrent purge): keep the previous exclude set
                # (over-inclusive, safe) and re-list next query
                sig = self._tomb_sig
            else:
                if excl is not None and excl.size == 0:
                    excl = None
                if (
                    excl is not None
                    and self.tombstone_limit is not None
                    and excl.size > self.tombstone_limit
                ):
                    if (
                        self.on_backlog == "merge"
                        and not _retried
                        and self.pin_snapshot is None
                    ):
                        # fold the backlog into a fresh snapshot, then
                        # re-resolve; _retried caps this at one merge —
                        # tombstones for zero-feature docs never change
                        # segment content, so an idempotent no-op merge
                        # cannot fold them and retrying forever would
                        # livelock
                        self.idx.merge_segments(self.spark)
                        return self.refresh(_retried=True)
                    if self.pin_snapshot is not None:
                        raise TombstoneBacklogError(
                            f"{excl.size} deletes since pinned snapshot "
                            f"{self.pin_snapshot} exceed tombstone_limit="
                            f"{self.tombstone_limit}; a merge cannot fold "
                            "deletes into a frozen snapshot — unpin, or "
                            "raise the limit for this historical reader"
                        )
                    raise TombstoneBacklogError(
                        f"{excl.size} unmerged tombstoned docs exceed "
                        f"tombstone_limit={self.tombstone_limit}; run "
                        "merge_segments (and purge_tombstones on your "
                        "compliance schedule) to fold them in"
                    )
                self._exclude = excl
                if dropped:
                    # a COMPLETED tombstone file failed its per-file
                    # read (transient I/O error or a torn file, not
                    # just a still-writing append): the exclude set is
                    # UNDER-inclusive. Serve with it (better than the
                    # stale set, which misses the files that DID read)
                    # but do not pin it under the current listing
                    # signature — a dirty sentinel never equals a real
                    # listing, so the very next query retries the read
                    # instead of waiting for the listing to change
                    sig = _DIRTY_SIG
            self._tomb_sig = sig
            changed = True
        return changed

    # -- queries ------------------------------------------------------------

    @property
    def snapshot_id(self) -> str | None:
        return self._snap_id

    def query(self, queries: list[dict], k: int = 10) -> list[tuple]:
        """[(query_id, rank, doc_id, score), ...] over the CURRENT
        committed snapshot, minus tombstoned docs. One Spark job per
        query (the latency path); for throughput use ``query_batch``."""
        self.refresh()
        return wand_bm25_serve(
            queries, self._index, self._segments, k=k,
            exclude_docs=self._exclude,
        )

    def query_dirichlet(
        self, queries: list[dict], k: int = 10, mu: float = 2000.0
    ) -> list[tuple]:
        """Second ranking family over the SAME served snapshot:
        LM-Dirichlet recomputed from the cached segments' stored tf
        streams (wand.dirichlet_topk_segments), minus tombstoned docs
        — live-docs under stored stats, the same contract as the BM25
        paths. The (doc_id, dl) table is reconstructed from the
        snapshot's segments ONCE per swap (doc_lengths_from_segments)
        and cached alongside the segment cache. All queries score in
        one distributed job."""
        self.refresh()
        if self._dl is None:
            from pyspark.sql import functions as F

            from .wand import doc_lengths_from_segments

            dl = doc_lengths_from_segments(self._segments).persist()
            self._c = float(dl.agg(F.sum("dl")).collect()[0][0] or 0.0)
            self._dl = dl
        from .pipeline import dirichlet_topk_serve

        return dirichlet_topk_serve(
            self.spark, queries, self._index, self._segments, self._dl,
            k=k, mu=mu, exclude_docs=self._exclude, c_total=self._c,
        )

    def query_batch(self, queries: list[dict], k: int = 10) -> list[tuple]:
        """As ``query`` but ALL queries run in ONE Spark job over the
        segment cache (result-identical, tested) — the throughput path
        when queries arrive faster than the job-scheduling rate."""
        self.refresh()
        return wand_bm25_serve_batch(
            queries, self._index, self._segments, k=k,
            exclude_docs=self._exclude,
        )

    def close(self) -> None:
        if self._segments is not None:
            self._segments.unpersist()
            self._segments = None
            self._snap_id = None
        if self._dl is not None:
            self._dl.unpersist()
            self._dl = None
