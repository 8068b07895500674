"""Property-based model test of the SnapshotLog commit protocol.

A RuleBasedStateMachine drives random interleavings of commit /
rollback / expire / conflicting-commit against a parallel in-memory
model and checks after every step that the on-disk log agrees with the
model: HEAD, the ancestor chain, each snapshot's file list, which data
files exist, and which snapshots expire() must sweep (including
branches orphaned by rollback). No Spark involved — the protocol is
pure filesystem."""

import os
import shutil
import tempfile

from hypothesis import settings
from hypothesis.stateful import (
    RuleBasedStateMachine,
    initialize,
    invariant,
    rule,
)
from hypothesis import strategies as st

from flame_spark.lineage import CommitConflict, SnapshotLog


class SnapshotModel(RuleBasedStateMachine):
    @initialize()
    def setup(self):
        self.root = tempfile.mkdtemp(prefix="snapmodel_")
        self.log = SnapshotLog(self.root)
        self.data = os.path.join(self.root, "data")
        os.makedirs(self.data, exist_ok=True)
        self.meta: dict[str, tuple[str | None, frozenset[str]]] = {}
        self.head: str | None = None
        self.seq = 0

    def teardown(self):
        shutil.rmtree(self.root, ignore_errors=True)

    # -- helpers ------------------------------------------------------------

    def _chain(self) -> list[str]:
        out, sid = [], self.head
        while sid is not None:
            out.append(sid)
            sid = self.meta[sid][0]
        return out

    def _new_files(self, n: int, reuse_prev: bool) -> list[str]:
        files = []
        if reuse_prev and self.head is not None:
            files.extend(sorted(self.meta[self.head][1])[:1])
        for _ in range(n):
            self.seq += 1
            p = os.path.join(self.data, f"f{self.seq:05d}.parquet")
            open(p, "w").close()
            files.append(p)
        return files

    # -- rules --------------------------------------------------------------

    @rule(n=st.integers(1, 3), reuse=st.booleans())
    def commit(self, n, reuse):
        files = self._new_files(n, reuse)
        sid = self.log.commit(
            files, base=self.data, operation="build",
            expected_parent=self.head,
        )
        self.meta[sid] = (self.head, frozenset(files))
        self.head = sid

    @rule(n=st.integers(1, 2))
    def conflicting_commit_raises(self, n):
        if self.head is None:
            return
        files = self._new_files(n, False)
        try:
            self.log.commit(
                files, base=self.data, operation="build",
                expected_parent=None,  # stale view: believes log empty
            )
            raise AssertionError("expected CommitConflict")
        except CommitConflict:
            pass

    @rule(pick=st.integers(0, 5))
    def rollback(self, pick):
        chain = self._chain()
        if not chain:
            return
        target = chain[pick % len(chain)]
        self.log.rollback(target)
        self.head = target

    @rule(keep=st.integers(1, 3))
    def expire(self, keep):
        chain = self._chain()
        kept = chain[:keep]
        kept_files = set().union(*(self.meta[s][1] for s in kept)) if kept else set()
        dropped = [s for s in self.meta if s not in kept]
        expected_gone = (
            set().union(*(self.meta[s][1] for s in dropped)) - kept_files
            if dropped
            else set()
        )
        deleted = set(self.log.expire(keep_last=keep))
        assert deleted == expected_gone, (deleted, expected_gone)
        for s in dropped:
            del self.meta[s]
        # oldest kept snapshot loses its parent link
        if kept:
            oldest = kept[-1]
            self.meta[oldest] = (None, self.meta[oldest][1])

    # -- invariants ---------------------------------------------------------

    @invariant()
    def head_matches(self):
        if not hasattr(self, "log"):
            return
        assert self.log.current_id() == self.head

    @invariant()
    def chain_matches(self):
        if not hasattr(self, "log"):
            return
        assert [m["snapshot_id"] for m in self.log.snapshots()] == self._chain()

    @invariant()
    def files_resolve_and_exist(self):
        if not hasattr(self, "log"):
            return
        for sid in self._chain():
            got = set(self.log.files(sid))
            assert got == set(self.meta[sid][1]), sid
            for f in got:
                assert os.path.exists(f), f

    @invariant()
    def log_holds_exactly_model_snapshots(self):
        if not hasattr(self, "log"):
            return
        on_disk = {
            f[len("snap-"):-len(".json")]
            for f in os.listdir(self.log.dir)
            if f.startswith("snap-") and f.endswith(".json")
        }
        assert on_disk == set(self.meta), (on_disk, set(self.meta))


TestSnapshotModel = SnapshotModel.TestCase
TestSnapshotModel.settings = settings(
    max_examples=40, stateful_step_count=25, deadline=None
)
