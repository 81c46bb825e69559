"""Stateful property fuzz of the manifest segment log: arbitrary
interleavings of commits, replays, crash windows (segment without cursor),
legacy migration and merges must keep the reader's view equal to a simple
in-memory model, with committed_state always correct regardless of cursor
health."""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import settings
from hypothesis import strategies as st
from hypothesis.stateful import RuleBasedStateMachine, initialize, invariant, rule

from sparrow_ipc_spark.sources import manifest as M


def _row(part_id: int, snap: int, file: str | None):
    return {"part_id": part_id, "n_blocks": 1, "n_rows": 10, "raw_bytes": 100,
            "enc_bytes": 40, "codec_summary": "[]", "status": "committed",
            "snapshot": snap, "file": file,
            "file_row_groups": 1 if file else None}


class ManifestMachine(RuleBasedStateMachine):
    @initialize()
    def setup(self):
        self.dir = tempfile.mkdtemp(prefix="man_fuzz_")
        self.model: dict[tuple, dict] = {}  # (part_id, file) → row
        self.next_part = 0
        self.next_snap = 0

    def teardown(self):
        shutil.rmtree(self.dir, ignore_errors=True)

    def _commit(self, n_parts: int, seg_name: str | None, crash_cursor: bool):
        snap = self.next_snap
        rows = []
        for _ in range(n_parts):
            r = _row(self.next_part, snap, f"f{self.next_part}.parquet")
            rows.append(r)
            self.model[(r["part_id"], r["file"])] = r
            self.next_part += 1
        M.write_segment(self.dir, [dict(r) for r in rows], seg_name)
        if not crash_cursor:
            M.write_cursor(self.dir, snap, self.next_part - 1)
        self.next_snap += 1

    @rule(n=st.integers(1, 4), crash=st.booleans())
    def commit(self, n, crash):
        self._commit(n, None, crash)

    @rule(n=st.integers(1, 3))
    def replayed_commit(self, n):
        """Deterministic segment name written twice (stream replay):
        second write overwrites the first — no duplicate rows."""
        name = f"seg-batch-{self.next_snap:08d}.parquet"
        snap = self.next_snap
        rows = []
        for _ in range(n):
            r = _row(self.next_part, snap, f"f{self.next_part}.parquet")
            rows.append(r)
            self.model[(r["part_id"], r["file"])] = r
            self.next_part += 1
        M.write_segment(self.dir, [dict(r) for r in rows], name)
        M.write_segment(self.dir, [dict(r) for r in rows], name)  # replay
        M.write_cursor(self.dir, snap, self.next_part - 1)
        self.next_snap += 1

    @rule()
    def legacy_file_appears(self):
        """A pre-segment manifest.parquet lands (old dir being upgraded);
        the next write_segment must migrate it losslessly."""
        d = M.man_dir(self.dir)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "manifest.parquet")):
            return
        os.makedirs(d, exist_ok=True)
        r = _row(self.next_part, self.next_snap, None)
        legacy = {k: v for k, v in r.items() if k not in ("file", "file_row_groups")}
        pq.write_table(pa.Table.from_pylist([legacy]),
                       os.path.join(d, "manifest.parquet"))
        # a REAL pre-segment writer overwrites the whole manifest dir
        # (Spark mode=overwrite), which removes the cursor with it — model
        # that: an out-of-band legacy write never leaves a live cursor
        cur = os.path.join(d, "_cursor.json")
        if os.path.exists(cur):
            os.remove(cur)
        self.model[(r["part_id"], None)] = r
        self.next_part += 1
        self.next_snap += 1

    @rule()
    def force_merge(self):
        M._maybe_merge_segments(M.man_dir(self.dir), limit=0)

    @invariant()
    def reader_matches_model(self):
        if not hasattr(self, "model"):
            return
        got = {(r["part_id"], r.get("file")): r for r in M.read_manifest_rows(self.dir)}
        assert set(got) == set(self.model)
        for k, want in self.model.items():
            assert int(got[k]["snapshot"]) == int(want["snapshot"])
            assert int(got[k]["n_rows"]) == want["n_rows"]

    @invariant()
    def committed_state_correct(self):
        if not hasattr(self, "model") or not self.model:
            return
        snap, part = M.committed_state(self.dir)
        assert snap == max(int(r["snapshot"]) for r in self.model.values())
        assert part == max(pid for pid, _ in self.model)


TestManifestMachine = ManifestMachine.TestCase
TestManifestMachine.settings = settings(max_examples=40, stateful_step_count=20,
                                        deadline=None)
