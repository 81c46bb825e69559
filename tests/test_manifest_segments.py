"""Round-4 manifest plane: append-only segments, O(batch) commits,
zero-footer read planning, cursor-based streaming offsets, migration.

The reference writes ONE footer per file at close
(/root/reference/src/stream_file_serializer.cpp:34-129); a multi-writer
10^12-turn table needs the Iceberg-style append-only manifest log these
tests pin down.
"""

from __future__ import annotations

import json
import os

import pytest

from sparrow_ipc_spark.sources import manifest as M
from sparrow_ipc_spark.sources.datasource import (
    SparrowIPCDataSource,
    SparrowIPCReader,
    SparrowIPCStreamReader,
    _blocks_files,
    _infer_fields,
)


@pytest.fixture(scope="module")
def ds_dir(spark, tmp_path_factory):
    """A directory written through the Spark DataSource writer in three
    commits (overwrite + two appends)."""
    out = str(tmp_path_factory.mktemp("seg") / "enc")
    spark.dataSource.register(SparrowIPCDataSource)
    ev = spark.range(0, 3000).selectExpr(
        "cast(id as string) as conv_id", "cast(id % 7 as int) as turn_idx",
        "concat('txt-', id) as text")
    ev.repartition(3).write.format("sparrow_ipc").mode("overwrite").save(out)
    ev.repartition(2).write.format("sparrow_ipc").mode("append").save(out)
    ev.repartition(2).write.format("sparrow_ipc").mode("append").save(out)
    return out


def _segments(out: str) -> list[str]:
    d = os.path.join(out, "manifest")
    return sorted(f for f in os.listdir(d)
                  if f.startswith("seg-") and f.endswith(".parquet"))


def test_commit_appends_one_segment_per_write(ds_dir):
    assert len(_segments(ds_dir)) == 3


def test_commit_does_not_rewrite_prior_segments(spark, tmp_path):
    """O(batch) commit: an append must leave every previously-committed
    segment file byte-untouched (same inode, mtime, size) — the committed
    history is never rewritten, however many parts the table holds."""
    out = str(tmp_path / "enc")
    ev = spark.range(0, 500).selectExpr("cast(id as string) as conv_id",
                                        "concat('t', id) as text")
    ev.repartition(2).write.format("sparrow_ipc").mode("overwrite").save(out)
    before = {f: os.stat(os.path.join(out, "manifest", f))
              for f in _segments(out)}
    ev.repartition(2).write.format("sparrow_ipc").mode("append").save(out)
    for f, st in before.items():
        now = os.stat(os.path.join(out, "manifest", f))
        assert (now.st_ino, now.st_mtime_ns, now.st_size) == \
            (st.st_ino, st.st_mtime_ns, st.st_size)


def test_partitions_plan_without_footer_reads(ds_dir, monkeypatch):
    """The committed manifest records (file, file_row_groups), so read
    planning opens ZERO parquet footers — at 10^4+ block files per table
    that is the difference between instant planning and minutes of serial
    driver I/O."""
    import pyarrow.parquet as pq

    fields = _infer_fields(ds_dir)

    def boom(*a, **k):  # any footer open during planning = regression
        raise AssertionError("partitions() opened a parquet footer")

    monkeypatch.setattr(pq, "ParquetFile", boom)
    r = SparrowIPCReader({"path": ds_dir}, fields)
    parts = r.partitions()
    assert parts
    planned = {os.path.basename(p.file) for p in parts}
    assert planned == {os.path.basename(f) for f in _blocks_files(ds_dir)}
    # spans cover every row group exactly once per file
    spans: dict[str, list[tuple[int, int]]] = {}
    for p in parts:
        spans.setdefault(p.file, []).append((p.rg_start, p.rg_end))
    for f, ss in spans.items():
        ss.sort()
        assert ss[0][0] == 0
        for (s0, e0), (s1, e1) in zip(ss, ss[1:]):
            assert e0 == s1


def test_partitions_footer_fallback_when_manifest_missing(ds_dir, tmp_path):
    """A manifest-less (or crash-inconsistent) dir still plans correctly
    via threaded footer reads."""
    import shutil

    out = str(tmp_path / "copy")
    shutil.copytree(ds_dir, out)
    shutil.rmtree(os.path.join(out, "manifest"))
    fields = _infer_fields(out)
    parts = SparrowIPCReader({"path": out}, fields).partitions()
    assert {os.path.basename(p.file) for p in parts} == \
        {os.path.basename(f) for f in _blocks_files(out)}


def test_write_encoded_records_file_mapping(spark, tmp_path):
    """write_encoded commits also record the physical file mapping, so
    DS reads of job-written dirs plan footer-free too."""
    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.sources.transcripts import transcripts_df

    out = str(tmp_path / "enc")
    df = transcripts_df(spark, n_convs=60, seed=3)
    write_encoded(spark, df, out, n_parts=4)
    rows = M.read_manifest_rows(out)
    assert rows and all(r["file"] and r["file_row_groups"] for r in rows)
    disk = {os.path.basename(f) for f in _blocks_files(out)}
    assert {r["file"] for r in rows} == disk


def test_append_vacuums_orphan_blocks(spark, tmp_path):
    """A crashed append leaves unmanifested block files; the next
    append/resume removes them (the manifest is the commit record), so
    planning stays footer-free and decode never sees duplicates.  A
    manifest whose file mapping is INCONSISTENT with disk (hand-rewritten
    dir) must NOT vacuum."""
    import shutil

    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.sources.transcripts import transcripts_df

    out = str(tmp_path / "enc")
    df = transcripts_df(spark, n_convs=40, seed=5)
    write_encoded(spark, df, out, n_parts=2)
    bd = os.path.join(out, "blocks")
    committed = {f for f in os.listdir(bd) if f.endswith(".parquet")}
    # orphan: copy of a committed file under an unmanifested name
    src = sorted(committed)[0]
    shutil.copy2(os.path.join(bd, src), os.path.join(bd, "orphan-crash.parquet"))
    df2 = transcripts_df(spark, n_convs=10, seed=6)
    write_encoded(spark, df2, out, n_parts=1, append=True)
    on_disk = {f for f in os.listdir(bd) if f.endswith(".parquet")}
    assert "orphan-crash.parquet" not in on_disk
    rows = M.read_manifest_rows(out)
    assert {r["file"] for r in rows} == on_disk  # planning check holds


def test_cursor_o1_latest_offset(ds_dir, monkeypatch):
    """latestOffset reads the O(1) cursor — never lists blocks/ (10^6
    files at scale) and never reads a segment."""
    cur = M.read_cursor(ds_dir)
    assert cur is not None and cur["snapshot"] == 2
    assert cur["n_segments"] == 3  # and a stale count invalidates it below
    fields = _infer_fields(ds_dir)

    import sparrow_ipc_spark.sources.datasource as D

    r = SparrowIPCStreamReader({"path": ds_dir}, fields)
    assert r.latestOffset() == {"snap": 2}  # first call probes capability

    def boom(*a, **k):
        raise AssertionError("latestOffset touched the filesystem beyond the cursor")

    monkeypatch.setattr(D, "_blocks_files", boom)
    monkeypatch.setattr(D, "_read_manifest_rows", boom)
    # steady state: every subsequent trigger is one cursor read, O(1)
    assert r.latestOffset() == {"snap": 2}


def test_stream_offsets_resolve_incremental_files(ds_dir):
    r = SparrowIPCStreamReader({"path": ds_dir}, _infer_fields(ds_dir))
    all_files = {os.path.basename(f) for f in _blocks_files(ds_dir)}
    rows = M.read_manifest_rows(ds_dir)
    f0 = r._offset_files({"snap": 0}, rows)
    f2 = r._offset_files({"snap": 2}, rows)
    assert f0 < f2 == all_files
    assert r._offset_files(r.initialOffset(), rows) == set()
    parts = r.partitions({"snap": 0}, {"snap": 2})
    assert {os.path.basename(p.file) for p in parts} == f2 - f0


def test_segment_merge_bounds_file_count(tmp_path):
    out = str(tmp_path / "t")
    for i in range(M.SEGMENT_LIMIT + 8):
        M.write_segment(out, [{
            "part_id": i, "n_blocks": 1, "n_rows": 10, "raw_bytes": 100,
            "enc_bytes": 50, "codec_summary": "[]", "status": "committed",
            "snapshot": i, "file": f"f{i}.parquet", "file_row_groups": 1,
        }])
    d = os.path.join(out, "manifest")
    segs = [f for f in os.listdir(d) if f.startswith("seg-")]
    assert len(segs) <= M.SEGMENT_LIMIT + 1
    rows = M.read_manifest_rows(out)
    assert {int(r["part_id"]) for r in rows} == set(range(M.SEGMENT_LIMIT + 8))


def test_legacy_manifest_migration(tmp_path):
    """A pre-segment manifest (single manifest.parquet, no file column) is
    migrated on first append; old rows survive with file=None."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = str(tmp_path / "t")
    d = os.path.join(out, "manifest")
    os.makedirs(d)
    legacy = pa.Table.from_pylist([{
        "part_id": 0, "n_blocks": 2, "n_rows": 20, "raw_bytes": 200,
        "enc_bytes": 90, "codec_summary": "[]", "status": "committed",
    }])
    pq.write_table(legacy, os.path.join(d, "manifest.parquet"))
    M.write_segment(out, [{
        "part_id": 1, "n_blocks": 1, "n_rows": 10, "raw_bytes": 100,
        "enc_bytes": 50, "codec_summary": "[]", "status": "committed",
        "snapshot": 1, "file": "f1.parquet", "file_row_groups": 1,
    }])
    assert not os.path.exists(os.path.join(d, "manifest.parquet"))
    rows = {int(r["part_id"]): r for r in M.read_manifest_rows(out)}
    assert rows[0]["file"] is None and rows[0]["snapshot"] == 0
    assert rows[1]["file"] == "f1.parquet"


def test_crash_duplicate_segment_rows_dedupe(tmp_path):
    """A crash between segment-merge and old-segment deletion can leave
    the same (part_id, file) row twice; readers keep the highest-snapshot
    copy."""
    out = str(tmp_path / "t")
    row = {"part_id": 0, "n_blocks": 1, "n_rows": 10, "raw_bytes": 100,
           "enc_bytes": 50, "codec_summary": "[]", "status": "committed",
           "snapshot": 0, "file": "f.parquet", "file_row_groups": 1}
    M.write_segment(out, [dict(row)])
    M.write_segment(out, [dict(row, snapshot=1)])
    rows = M.read_manifest_rows(out)
    assert len(rows) == 1 and int(rows[0]["snapshot"]) == 1


def test_cursor_recovery_from_full_read(ds_dir, tmp_path):
    """Missing/corrupt cursor degrades to a full segment read with the
    same answer."""
    import shutil

    out = str(tmp_path / "copy")
    shutil.copytree(ds_dir, out)
    snap_fast, part_fast = M.committed_state(out)
    os.remove(os.path.join(out, "manifest", "_cursor.json"))
    assert M.committed_state(out) == (snap_fast, part_fast)
    with open(os.path.join(out, "manifest", "_cursor.json"), "w") as f:
        f.write("{not json")
    assert M.committed_state(out) == (snap_fast, part_fast)


def test_stale_cursor_detected_by_segment_count(ds_dir, tmp_path):
    """A crash between a segment publish and the cursor update leaves the
    cursor behind by one segment; read_cursor must refuse it (trusting it
    would reuse snapshot/part ids) and committed_state must fall back to
    the full read."""
    import shutil

    out = str(tmp_path / "copy")
    shutil.copytree(ds_dir, out)
    snap, maxp = M.committed_state(out)
    # simulate the crash: a new segment lands, cursor not updated
    import pyarrow as pa
    import pyarrow.parquet as pq

    row = {"part_id": maxp + 1, "n_blocks": 1, "n_rows": 1, "raw_bytes": 1,
           "enc_bytes": 1, "codec_summary": "[]", "status": "committed",
           "snapshot": snap + 1, "file": "zz.parquet", "file_row_groups": 1}
    pq.write_table(pa.Table.from_pylist([row], schema=M.manifest_pa_schema()),
                   os.path.join(out, "manifest", "seg-crashed.parquet"))
    assert M.read_cursor(out) is None  # stale → refused
    assert M.committed_state(out) == (snap + 1, maxp + 1)  # full read wins


def test_merge_keeps_just_written_deterministic_segment(tmp_path):
    """Segment merging must never fold away the segment a replay would
    need: the just-written deterministic segment survives the merge."""
    out = str(tmp_path / "t")
    for i in range(5):
        M.write_segment(out, [{
            "part_id": i, "n_blocks": 1, "n_rows": 1, "raw_bytes": 1,
            "enc_bytes": 1, "codec_summary": "[]", "status": "committed",
            "snapshot": i, "file": f"f{i}.parquet", "file_row_groups": 1,
        }], f"seg-fb-{i:08d}.parquet", merge_limit=0)
        d = os.path.join(out, "manifest")
        assert f"seg-fb-{i:08d}.parquet" in os.listdir(d)
    # every row still readable after the rolling merges
    assert {int(r["part_id"]) for r in M.read_manifest_rows(out)} == set(range(5))


def test_segment_commit_info_prefers_recorded_offset(tmp_path):
    """The replayed part offset comes from the recorded part_offset column
    (exact even when the lowest hash partition encoded zero rows), not
    min(part_id)."""
    out = str(tmp_path / "t")
    M.write_segment(out, [{
        "part_id": 11, "n_blocks": 1, "n_rows": 1, "raw_bytes": 1,
        "enc_bytes": 1, "codec_summary": "[]", "status": "committed",
        "snapshot": 3, "file": "f11.parquet", "file_row_groups": 1,
        "part_offset": 10,  # partition 0 (part 10) was empty
    }], "seg-fb-00000007.parquet")
    off, snap = M.segment_commit_info(out, "seg-fb-00000007.parquet")
    assert (off, snap) == (10, 3)
    assert M.segment_commit_info(out, "seg-fb-00000099.parquet") == (None, None)


def test_unresolvable_snap_offset_fails_loudly(ds_dir, tmp_path):
    """A checkpointed snapshot offset that legacy (file=None) rows make
    unresolvable must raise — silently treating it as the empty set would
    advance the checkpoint past real data forever."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    out = str(tmp_path / "copy")
    shutil.copytree(ds_dir, out)
    fields = _infer_fields(out)
    r = SparrowIPCStreamReader({"path": out}, fields)
    assert "snap" in r.latestOffset()
    # out-of-band legacy row (no file mapping) lands mid-run
    legacy = pa.Table.from_pylist([{
        "part_id": 999, "n_blocks": 1, "n_rows": 1, "raw_bytes": 1,
        "enc_bytes": 1, "codec_summary": "[]", "status": "committed",
    }])
    pq.write_table(legacy, os.path.join(out, "manifest", "manifest.parquet"))
    # degraded capability: latestOffset falls back to the file-set form
    assert "seen" in r.latestOffset()
    with _pytest.raises(ValueError, match="snapshot offset"):
        r.partitions({"snap": 0}, {"snap": 2})
