"""Resumable, checkpointed segment builds with per-partition lineage.

Production design targets Iceberg (atomic overwritePartitions + snapshot
ids); the Iceberg runtime jars are not present in this sandbox, so the
same protocol is implemented over a plain parquet warehouse:

- the segment table is laid out as ``segments/shard=NN/`` partitions;
- a ``lineage`` table records one row per completed shard:
  (shard, input_snapshot, rows_in, rows_out, digest, completed_at);
- resume = anti-join: shards already recorded for the SAME
  input_snapshot are skipped; each shard write is idempotent (full
  overwrite of its own partition directory followed by the lineage
  append), so a kill between the two leaves a re-doable shard, never a
  half-visible one;
- a ``metrics`` table accumulates (run_id, stage, metric, value) rows.

The digest is order-insensitive (sum of xxhash64 over canonicalized
row bytes) so it can be recomputed distributed at any parallelism.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from .segments import SEGMENT_SCHEMA

#: "caller did not specify expected_parent" sentinel — distinct from
#: None, which is a real expectation (an empty log).
_UNSET = object()


class SegmentWarehouse:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def segments_path(self) -> str:
        return os.path.join(self.root, "segments")

    @property
    def lineage_path(self) -> str:
        return os.path.join(self.root, "lineage")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.root, "metrics")

    # -- lineage ------------------------------------------------------------

    def completed_shards(self, spark: SparkSession, input_snapshot: str) -> set[int]:
        if not os.path.isdir(self.lineage_path):
            return set()
        rows = (
            spark.read.parquet(self.lineage_path)
            .filter(F.col("input_snapshot") == input_snapshot)
            .select("shard")
            .collect()
        )
        return {int(r["shard"]) for r in rows}

    def record_lineage(
        self,
        spark: SparkSession,
        shard: int,
        input_snapshot: str,
        rows_in: int,
        rows_out: int,
        digest: str,
    ) -> None:
        row = [
            (
                int(shard),
                input_snapshot,
                int(rows_in),
                int(rows_out),
                digest,
                float(time.time()),
            )
        ]
        spark.createDataFrame(
            row,
            "shard int, input_snapshot string, rows_in long, rows_out long, "
            "digest string, completed_at double",
        ).coalesce(1).write.mode("append").parquet(self.lineage_path)

    def record_metric(
        self, spark: SparkSession, run_id: str, stage: str, metric: str, value: float
    ) -> None:
        spark.createDataFrame(
            [(run_id, stage, metric, float(value))],
            "run_id string, stage string, metric string, value double",
        ).coalesce(1).write.mode("append").parquet(self.metrics_path)

    # -- segment build ------------------------------------------------------

    def build_checkpointed(
        self,
        postings_scored: DataFrame,
        n_docs: int,
        n_shards: int,
        block_size: int,
        input_snapshot: str,
        fail_after_shards: int | None = None,
        out_root: str | None = None,
    ) -> None:
        """Build all shards, skipping ones already recorded in lineage.

        ``fail_after_shards`` injects a crash after N shard commits —
        used by the kill-and-resume test. ``out_root`` redirects the
        shard partition dirs (default: the warehouse's mutable
        ``segments/`` table; ``build_snapshot`` passes an immutable
        per-snapshot dir instead).

        Scale note: locally this loops shards on the driver (each shard
        is one narrow job); on a real cluster the same protocol runs as
        ONE job with dynamic-partition-overwrite — the loop exists to
        make per-shard commit/kill semantics testable.
        """
        from .segments import build_segments, shard_span

        spark = postings_scored.sparkSession
        done = self.completed_shards(spark, input_snapshot)
        if out_root is not None:
            # lineage rows outlive snapshot expiry (append-only table);
            # a shard only counts as done if its data dir still holds
            # parquet files (expire() removes files, possibly leaving
            # empty dirs), so rebuilding a previously-expired snapshot
            # re-encodes the deleted shards instead of committing a
            # manifest over missing files
            def _has_parquet(shard: int) -> bool:
                d = os.path.join(out_root, f"shard={shard}")
                try:
                    return any(f.endswith(".parquet") for f in os.listdir(d))
                except FileNotFoundError:
                    return False

            done = {s for s in done if _has_parquet(s)}
        span = shard_span(n_docs, n_shards)
        # doc ids are dense over RAW rows while n_docs counts
        # filtered-in docs, so the top ids can spill past
        # n_shards * span — cover every shard actually present (same
        # shard function build_segments applies)
        max_doc = postings_scored.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
        n_shards_present = max(
            n_shards, (int(max_doc) // span) + 1 if max_doc is not None else 0
        )
        built = 0
        for shard in range(n_shards_present):
            if shard in done:
                continue
            shard_t0 = time.time()
            lo, hi = shard * span, (shard + 1) * span
            part = postings_scored.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            seg = build_segments(part, n_docs, n_shards, block_size).filter(
                F.col("shard") == shard
            )
            out_dir = os.path.join(
                out_root or self.segments_path, f"shard={shard}"
            )
            seg.drop("shard").write.mode("overwrite").parquet(out_dir)
            written = spark.read.parquet(out_dir)
            rows_out = written.count()
            rows_in = part.count()
            digest_row = written.agg(
                F.sum(
                    F.xxhash64(
                        "term", "n_docs", "first_doc", "last_doc", "doc_deltas"
                    ).cast("decimal(38,0)")
                ).alias("d")
            ).collect()[0]
            digest = str(digest_row["d"])
            self.record_lineage(
                spark, shard, input_snapshot, rows_in, rows_out, digest
            )
            dt = max(time.time() - shard_t0, 1e-9)
            self.record_metric(
                spark, input_snapshot, f"shard_{shard}", "postings_per_sec",
                rows_in / dt,
            )
            built += 1
            if fail_after_shards is not None and built >= fail_after_shards:
                raise RuntimeError(f"injected failure after {built} shards")

    def read_segments(self, spark: SparkSession) -> DataFrame:
        return spark.read.option("basePath", self.segments_path).parquet(
            self.segments_path
        )

    # -- snapshots (Iceberg-style commit protocol) --------------------------

    @property
    def snapshot_log(self) -> "SnapshotLog":
        if not hasattr(self, "_snapshot_log"):
            self._snapshot_log = SnapshotLog(self.root)
        return self._snapshot_log

    def build_snapshot(
        self,
        postings_scored: DataFrame,
        n_docs: int,
        n_shards: int,
        block_size: int,
        input_snapshot: str,
        fail_after_shards: int | None = None,
        operation: str = "overwrite",
        summary: dict | None = None,
        expected_parent=_UNSET,
    ) -> str:
        """Checkpointed shard build into an IMMUTABLE per-snapshot data
        dir, then ONE atomic snapshot commit. Until the commit, readers
        (``read_snapshot``) keep seeing the previous snapshot — a kill
        mid-build leaves per-shard lineage for resume but never a
        half-visible table. Returns the committed snapshot id.

        Idempotent per input: if HEAD was already built from this exact
        ``input_snapshot``, its id is returned and nothing is committed
        — a job re-run (resume after success, scheduler retry) never
        publishes duplicate snapshots."""
        head = self.snapshot_log.current_id()
        if head is not None and (
            self.snapshot_log.manifest(head)["summary"].get("input_snapshot")
            == input_snapshot
        ):
            return head
        data_root = os.path.join(self.root, "data", input_snapshot)
        self.build_checkpointed(
            postings_scored, n_docs, n_shards, block_size, input_snapshot,
            fail_after_shards=fail_after_shards, out_root=data_root,
        )
        files = sorted(
            os.path.join(dp, f)
            for dp, _, fs in os.walk(data_root)
            for f in fs
            if f.endswith(".parquet")
        )
        s = dict(summary or {})
        s.setdefault("input_snapshot", input_snapshot)
        s.setdefault("n_shards", n_shards)
        return self.snapshot_log.commit(
            files, base=data_root, operation=operation, summary=s,
            expected_parent=expected_parent,
        )

    def read_snapshot(
        self, spark: SparkSession, snap_id: str | None = None
    ) -> DataFrame:
        """Segment table AT a snapshot (default: current HEAD) — reads
        exactly the manifest's file list, so concurrent builds/merges
        never tear a read. Schema matches ``read_segments`` (the
        ``shard`` partition column is restored via basePath)."""
        m = self.snapshot_log.manifest(snap_id)
        base = os.path.join(self.root, m["base"])
        files = [os.path.join(self.root, f) for f in m["files"]]
        return spark.read.option("basePath", base).parquet(*files)


class CommitConflict(RuntimeError):
    """Another writer committed since the expected parent snapshot —
    re-read HEAD and retry (optimistic concurrency, as in Iceberg)."""


class SnapshotLog:
    """Append-only snapshot log + atomic HEAD pointer over a plain
    filesystem — the Iceberg table-commit protocol re-implemented
    without the runtime jars (absent in this sandbox):

    - every commit writes an immutable manifest ``snap-<id>.json``
      listing the snapshot's data files (paths relative to the
      warehouse root, so the warehouse is relocatable);
    - visibility is ONE atomic ``os.replace`` of the ``HEAD`` file —
      readers resolve HEAD, then read exactly that manifest's files:
      no torn reads against concurrent writers, ever;
    - parent links give time travel (``snapshots()`` walks the chain,
      ``read_snapshot(spark, old_id)`` serves any retained snapshot);
    - ``rollback`` re-points HEAD at an ancestor (metadata-only);
    - ``expire`` deletes snapshots older than the last N along with
      data files no retained snapshot references.

    Concurrency: ``commit(expected_parent=...)`` raises
    ``CommitConflict`` if HEAD moved — the caller re-reads and retries,
    exactly Iceberg's optimistic loop. (On a real object store the
    HEAD swap maps to a conditional PUT / rename-if-absent.)
    """

    def __init__(self, root: str):
        self.root = root
        self.dir = os.path.join(root, "snapshots")
        os.makedirs(self.dir, exist_ok=True)

    # -- paths --------------------------------------------------------------

    @property
    def _head(self) -> str:
        return os.path.join(self.dir, "HEAD")

    def _snap_path(self, snap_id: str) -> str:
        return os.path.join(self.dir, f"snap-{snap_id}.json")

    # -- reads --------------------------------------------------------------

    def current_id(self) -> str | None:
        try:
            with open(self._head, encoding="utf-8") as f:
                return f.read().strip() or None
        except FileNotFoundError:
            return None

    def manifest(self, snap_id: str | None = None) -> dict:
        sid = snap_id or self.current_id()
        if sid is None:
            raise FileNotFoundError("snapshot log is empty (no HEAD)")
        with open(self._snap_path(sid), encoding="utf-8") as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """Manifest chain from HEAD back to the root, newest first."""
        out, sid = [], self.current_id()
        while sid is not None:
            m = self.manifest(sid)
            out.append(m)
            sid = m["parent_id"]
        return out

    def files(self, snap_id: str | None = None) -> list[str]:
        m = self.manifest(snap_id)
        return [os.path.join(self.root, f) for f in m["files"]]

    # -- writes -------------------------------------------------------------

    # the shared module-level sentinel (see top of file): build_snapshot
    # forwards its own default straight through, so both layers must
    # agree on what "caller did not specify" looks like
    _UNSET = _UNSET

    def _atomic_write(self, path: str, content: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _commit_lock(self):
        """Exclusive advisory lock serializing the read-check-swap span
        of every HEAD writer. Without it commit(expected_parent=...) is
        check-then-act: two racing committers (WarehouseServer's
        on_backlog='merge' vs the admin CLI is a real pairing) can both
        read the same HEAD, both pass the expected_parent check, mint
        the same sequence number, and both rename — last writer wins and
        the loser's snapshot is silently orphaned instead of getting the
        CommitConflict the optimistic loop is built on. flock is held
        only across the metadata span (microseconds — data files are
        written before commit is called), dies with the process (no
        stale-lock recovery needed), and serializes across processes on
        one host; a multi-host deployment would swap this layer for a
        real catalog (Iceberg/Hive) whose commit is already atomic."""
        import fcntl
        from contextlib import contextmanager

        lock_path = os.path.join(self.dir, "commit.lock")

        @contextmanager
        def held():
            fd = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o644)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return held()

    def commit(
        self,
        files: list[str],
        base: str,
        operation: str,
        summary: dict | None = None,
        expected_parent=_UNSET,
    ) -> str:
        """Publish a new snapshot over ``files`` (absolute paths under
        the warehouse root). Returns the new snapshot id. The
        expected_parent check, sequence mint, and HEAD swap happen
        under one exclusive lock (see _commit_lock) so a concurrent
        committer observes either this commit's HEAD or a
        CommitConflict — never a silent orphan."""
        import uuid

        with self._commit_lock():
            parent = self.current_id()
            if expected_parent is not self._UNSET and parent != expected_parent:
                raise CommitConflict(
                    f"HEAD is {parent!r}, expected {expected_parent!r}"
                )
            seq = (self.manifest(parent)["sequence"] + 1) if parent else 0
            sid = f"{seq:08d}-{uuid.uuid4().hex[:12]}"
            rel = [os.path.relpath(f, self.root) for f in files]
            manifest = {
                "snapshot_id": sid,
                "parent_id": parent,
                "sequence": seq,
                "operation": operation,
                "committed_at": time.time(),
                "base": os.path.relpath(base, self.root),
                "files": rel,
                "summary": summary or {},
            }
            # manifest first (immutable, invisible), HEAD swap last
            # (atomic visibility) — a kill between the two leaves HEAD
            # unchanged
            self._atomic_write(
                self._snap_path(sid), json.dumps(manifest, indent=1)
            )
            self._atomic_write(self._head, sid)
        return sid

    def rollback(self, snap_id: str) -> None:
        """Re-point HEAD at an ancestor snapshot (metadata-only undo).
        Takes the commit lock so the ancestor check and the HEAD swap
        are atomic against a racing commit."""
        with self._commit_lock():
            chain = {m["snapshot_id"] for m in self.snapshots()}
            if snap_id not in chain:
                raise ValueError(f"{snap_id!r} is not an ancestor of HEAD")
            self._atomic_write(self._head, snap_id)

    def expire(self, keep_last: int = 2) -> list[str]:
        """Drop snapshots older than the newest ``keep_last`` on the
        HEAD chain — plus any snapshot NOT on the HEAD chain at all
        (branches orphaned by ``rollback`` would otherwise leak their
        manifests and data files forever) — and delete data files no
        retained snapshot references. Returns the deleted data-file
        paths."""
        if keep_last < 1:
            raise ValueError("expire: keep_last must be >= 1 (HEAD is live)")
        chain = self.snapshots()
        keep, drop = chain[:keep_last], chain[keep_last:]
        on_chain = {m["snapshot_id"] for m in chain}
        for fname in sorted(os.listdir(self.dir)):
            if not (fname.startswith("snap-") and fname.endswith(".json")):
                continue
            sid = fname[len("snap-") : -len(".json")]
            if sid not in on_chain:
                drop.append(self.manifest(sid))
        keep_files = {f for m in keep for f in m["files"]}
        deleted = []
        for m in drop:
            for f in m["files"]:
                if f not in keep_files:
                    p = os.path.join(self.root, f)
                    if os.path.exists(p):
                        os.remove(p)
                        deleted.append(p)
            os.remove(self._snap_path(m["snapshot_id"]))
        if keep:
            # sever the parent link of the oldest retained manifest so
            # snapshots() never dereferences an expired manifest
            oldest = dict(keep[-1])
            oldest["parent_id"] = None
            self._atomic_write(
                self._snap_path(oldest["snapshot_id"]),
                json.dumps(oldest, indent=1),
            )
        return deleted


def snapshot_id(df: DataFrame, key_cols: list[str]) -> str:
    """Deterministic input-snapshot id: order-insensitive xxhash sum over
    the key columns + row count (stand-in for an Iceberg snapshot id)."""
    row = df.agg(
        F.sum(F.xxhash64(*key_cols).cast("decimal(38,0)")).alias("h"),
        F.count("*").alias("n"),
    ).collect()[0]
    return f"{row['h']}-{row['n']}"
