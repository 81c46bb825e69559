"""Append-only manifest segments for encoded block directories.

The reference commits a stream file with ONE footer written at close
(/root/reference/src/stream_file_serializer.cpp:34-129).  A 10^12-turn
table is written by many jobs over time, so the Iceberg-style analog is an
append-only manifest *log*: every commit writes one new parquet segment
(`manifest/seg-*.parquet`) describing only the partitions it published —
commit cost is O(batch), never O(total parts) — and readers union the
segment files (a plain parquet-directory read for both pyarrow and Spark).

Layout of ``<table>/manifest/``:

* ``seg-*.parquet``   — one per commit (or one merged file after segment
  compaction).  Rows: part_id, n_blocks, n_rows, raw_bytes, enc_bytes,
  codec_summary, status, snapshot, plus the physical mapping ``file``
  (basename under ``blocks/``) and ``file_row_groups`` (that file's parquet
  row-group count) so the data source can plan row-group-spanned read
  partitions with ZERO driver-side footer I/O.
* ``_cursor.json``    — O(1) committed state: {"snapshot", "max_part_id"}.
  Atomically replaced after each segment publish; the streaming reader's
  ``latestOffset`` and writers' part-id offsets read it instead of walking
  the directory.  Missing/stale cursor degrades to a full segment read.
* ``_batch_<id>``     — streaming exactly-once markers (unchanged).

Concurrency contract: ONE writer per table at a time (crash-and-retry of
that writer is fully handled; two LIVE writers are not — both would read
the same committed state and mint colliding part ids/snapshots).  This is
the same stance as Iceberg without a catalog: multi-writer needs a
compare-and-swap commit arbiter, which a plain filesystem cannot provide;
pointing a catalog/lock service at ``write_segment``/``write_cursor`` is
the single integration point.  Readers are always safe concurrently with
the one writer (segments appear atomically; a half-published batch is
exposed at worst, never duplicated).

Crash contract: a segment file appears atomically (tmp + ``os.replace``).
Stream commits use DETERMINISTIC segment names (``seg-batch-<id>.parquet``)
so a replayed half-crashed commit overwrites its own segment instead of
appending a duplicate.  Segment compaction (merging > ``SEGMENT_LIMIT``
files into one) can race a crash into transient duplicate rows for a
part; readers therefore dedupe on (part_id, file), keeping the
highest-snapshot row — duplicates are byte-identical re-encodes, so this
is purely cosmetic.
"""

from __future__ import annotations

import json
import os
import uuid

_CURSOR = "_cursor.json"
SEGMENT_LIMIT = 64  # max seg files before an automatic merge


def man_dir(path: str) -> str:
    return os.path.join(path, "manifest")


def manifest_pa_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("part_id", pa.int32()), ("n_blocks", pa.int64()),
            ("n_rows", pa.int64()), ("raw_bytes", pa.int64()),
            ("enc_bytes", pa.int64()), ("codec_summary", pa.string()),
            ("status", pa.string()), ("snapshot", pa.int64()),
            ("file", pa.string()), ("file_row_groups", pa.int64()),
            # the part-id offset the committing job encoded against —
            # recorded explicitly because a replay must reuse it exactly
            # and min(part_id) under-reports it whenever the lowest hash
            # partition encoded zero rows (nullable: legacy rows)
            ("part_offset", pa.int64()),
        ]
    )


def read_cursor(path: str) -> dict | None:
    """O(1) committed state, or None (no cursor / unreadable / STALE).

    Staleness check: the cursor records the segment count it was written
    against; a crash between a segment publish and the cursor update
    leaves the count behind, and a stale cursor must NOT be trusted (it
    would reuse snapshot and part ids).  The check is one directory
    listing of names — still O(1) file reads."""
    d = man_dir(path)
    try:
        with open(os.path.join(d, _CURSOR)) as f:
            cur = json.load(f)
    except (OSError, ValueError):
        return None
    if "snapshot" not in cur or "max_part_id" not in cur:
        return None
    # count legacy files too: a pre-segment manifest landing after the
    # cursor was written (mixed-version writer) must also invalidate it
    if int(cur.get("n_segments", -1)) != len(_segment_files(d)) + len(_legacy_files(d)):
        return None  # stale: manifest changed without this cursor
    return cur


def write_cursor(path: str, snapshot: int, max_part_id: int) -> None:
    d = man_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f"_cursor.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump({"snapshot": int(snapshot), "max_part_id": int(max_part_id),
                   "n_segments": len(_segment_files(d)) + len(_legacy_files(d))}, f)
    os.replace(tmp, os.path.join(d, _CURSOR))


def _segment_files(d: str) -> list[str]:
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d)
                  if f.startswith("seg-") and f.endswith(".parquet"))


def _legacy_files(d: str) -> list[str]:
    """Pre-segment manifest parquet files (``manifest.parquet`` or Spark
    ``part-*`` output) that must be migrated into a segment."""
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d)
                  if f.endswith(".parquet") and not f.startswith(("seg-", "_", ".")))


def read_manifest_rows(path: str) -> list[dict]:
    """All committed manifest rows (segments + legacy files), deduped on
    (part_id, file) keeping the highest snapshot.  [] when no manifest.

    A crash between the legacy protocol's two renames can leave only
    ``manifest.old`` — fall back to it.  Real read errors PROPAGATE:
    silently treating a broken manifest as empty would restart part ids at
    0 and overwrite committed block files."""
    import pyarrow.parquet as pq

    d = man_dir(path)
    files = _segment_files(d) + _legacy_files(d)
    if not files:
        old = d + ".old"
        if not os.path.isdir(old):
            return []
        d, files = old, _legacy_files(old)
        if not files:
            return []
    rows: list[dict] = []
    for f in files:
        rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    best: dict[tuple, dict] = {}
    for r in rows:
        r.setdefault("snapshot", 0)
        key = (r["part_id"], r.get("file"))
        prev = best.get(key)
        if prev is None or int(r["snapshot"] or 0) > int(prev["snapshot"] or 0):
            best[key] = r
    return list(best.values())


def _migrate_legacy(d: str) -> None:
    """One-time rewrite of a pre-segment manifest dir into segment form
    (O(existing parts), paid once on the first append to an old table)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    legacy = _legacy_files(d)
    if not legacy:
        return
    rows = []
    for f in legacy:
        rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    for r in rows:
        r.setdefault("snapshot", 0)
        r.setdefault("file", None)
        r.setdefault("file_row_groups", None)
    seg = f"seg-migrated-{uuid.uuid4().hex[:8]}.parquet"
    tmp = os.path.join(d, f"_{seg}.tmp")
    pq.write_table(pa.Table.from_pylist(rows, schema=manifest_pa_schema()), tmp)
    os.replace(tmp, os.path.join(d, seg))
    for f in legacy:
        os.remove(os.path.join(d, f))
    # Spark-written legacy dirs carry a _SUCCESS marker; harmless but stale
    s = os.path.join(d, "_SUCCESS")
    if os.path.isfile(s):
        os.remove(s)


def _maybe_merge_segments(d: str, limit: int = SEGMENT_LIMIT,
                          keep: str | None = None) -> None:
    """Merge segments into one when the count exceeds ``limit`` — the
    periodic compaction that keeps reader cost bounded (the Iceberg
    rewrite-manifests analog).  ``keep`` (the just-written deterministic
    segment) is EXCLUDED from the merge: a crashed micro-batch commit is
    replayed against its own segment to recover its part offset and
    snapshot, so merging it away would make the replay mint fresh ids and
    duplicate the batch.  Only the newest deterministic segment is ever a
    replay target (Spark replays just the last uncommitted batch); older
    ones merge freely.  Crash mid-delete leaves duplicate rows; readers
    dedupe on (part_id, file) so this is safe."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    segs = [s for s in _segment_files(d) if s != keep]
    if len(segs) <= limit:
        return
    # merging changes the segment count a cursor was written against —
    # drop the cursor first (write_segment already did on the normal
    # path; this keeps direct/defensive callers safe too)
    try:
        os.remove(os.path.join(d, _CURSOR))
    except FileNotFoundError:
        pass
    rows = []
    for f in segs:
        rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    merged = f"seg-merged-{uuid.uuid4().hex[:8]}.parquet"
    tmp = os.path.join(d, f"_{merged}.tmp")
    pq.write_table(pa.Table.from_pylist(rows, schema=manifest_pa_schema()), tmp)
    os.replace(tmp, os.path.join(d, merged))
    for f in segs:
        os.remove(os.path.join(d, f))


def write_segment(path: str, man_rows: list[dict], seg_name: str | None = None,
                  merge_limit: int = SEGMENT_LIMIT) -> str:
    """Atomically publish one manifest segment (plus legacy migration and
    opportunistic segment merging).  Returns the segment file name.

    ``seg_name`` must be deterministic for replayable commits (streaming
    micro-batches) so a replay overwrites rather than duplicates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = man_dir(path)
    os.makedirs(d, exist_ok=True)
    # STRUCTURAL cursor invalidation: delete the cursor before touching the
    # log, so a crash anywhere before the caller's write_cursor leaves NO
    # cursor (full-read fallback) rather than a stale one.  The n_segments
    # check in read_cursor alone is not crash-safe: a merge can restore a
    # count an old cursor was written against (found by the stateful fuzz).
    try:
        os.remove(os.path.join(d, _CURSOR))
    except FileNotFoundError:
        pass
    _migrate_legacy(d)
    if seg_name is None:
        seg_name = f"seg-{uuid.uuid4().hex[:12]}.parquet"
    rows = []
    for r in man_rows:
        r = dict(r)
        r.setdefault("snapshot", 0)
        r.setdefault("file", None)
        r.setdefault("file_row_groups", None)
        r.setdefault("part_offset", None)
        rows.append(r)
    tmp = os.path.join(d, f"_{seg_name}.tmp")
    pq.write_table(pa.Table.from_pylist(rows, schema=manifest_pa_schema()), tmp)
    os.replace(tmp, os.path.join(d, seg_name))
    _maybe_merge_segments(d, merge_limit, keep=seg_name)
    return seg_name


def rewrite_manifest(path: str, man_rows: list[dict]) -> None:
    """Full manifest REWRITE (block compaction only): replaces every
    segment with one merged segment describing the post-rewrite table."""
    d = man_dir(path)
    os.makedirs(d, exist_ok=True)
    seg = write_segment(path, man_rows, f"seg-rewrite-{uuid.uuid4().hex[:8]}.parquet",
                        merge_limit=10**9)
    # delete everything the new segment supersedes (including any
    # migration segment write_segment just produced)
    for f in _segment_files(d) + _legacy_files(d):
        if f != seg:
            os.remove(os.path.join(d, f))
    snap = max((int(r.get("snapshot") or 0) for r in man_rows), default=0)
    maxp = max((int(r["part_id"]) for r in man_rows), default=-1)
    write_cursor(path, snap, maxp)


def committed_state(path: str) -> tuple[int, int]:
    """(max_snapshot, max_part_id) of the committed table; (-1, -1) when
    empty.  Cursor fast path, full segment read fallback."""
    cur = read_cursor(path)
    if cur is not None:
        return int(cur["snapshot"]), int(cur["max_part_id"])
    rows = read_manifest_rows(path)
    if not rows:
        return -1, -1
    return (max(int(r.get("snapshot") or 0) for r in rows),
            max(int(r["part_id"]) for r in rows))


def manifest_rows_for_new_files(spark, blocks_dir: str, new_files: list[str],
                                snapshot: int) -> list[dict]:
    """Manifest rows (with physical file mapping + commit-time row-group
    counts + snapshot) for freshly-written block parquet files — the ONE
    implementation of the O(batch) commit stamping shared by
    write_encoded, the foreachBatch StreamingEncoder, and compaction
    (three divergent copies of this block caused a replay bug once)."""
    from sparrow_ipc_spark.operators.encode_job import manifest_from_blocks

    if not new_files:
        return []
    written = spark.read.parquet(
        *[os.path.join(blocks_dir, f) for f in new_files]).drop("body")
    rg = row_group_counts([os.path.join(blocks_dir, f) for f in new_files])
    rows = [r.asDict() for r in
            manifest_from_blocks(written, with_file=True).collect()]
    for r in rows:
        base = os.path.basename(r["file"])
        r["file"] = base
        r["file_row_groups"] = rg.get(base)
        r["snapshot"] = int(snapshot)
    return rows


def segment_commit_info(path: str, seg_name: str) -> tuple[int | None, int | None]:
    """(part_offset, snapshot) recorded in one existing deterministic
    segment, or (None, None) when absent — ONE read of the two values a
    replayed micro-batch commit must reuse together.  Minting fresh ones
    would re-encode the batch under new part ids (decode's byte-identical
    dedupe stops matching → every row doubles) and shift its snapshot (a
    snapshot-offset reader re-delivers; old-snapshot time travel loses
    it).  part_offset is the recorded column when present (exact even if
    the lowest hash partition encoded zero rows); min(part_id) covers
    pre-column segments."""
    import pyarrow.parquet as pq

    p = os.path.join(man_dir(path), seg_name)
    if not os.path.isfile(p):
        return None, None
    t = pq.read_table(p)
    snap_col = t.column("snapshot").to_pylist() if "snapshot" in t.column_names else []
    snap = max((int(v or 0) for v in snap_col), default=None)
    off = None
    if "part_offset" in t.column_names:
        offs = [int(v) for v in t.column("part_offset").to_pylist() if v is not None]
        off = min(offs) if offs else None
    if off is None and "part_id" in t.column_names:
        off = min((int(v) for v in t.column("part_id").to_pylist()), default=None)
    return off, snap


def row_group_counts(paths: list[str], max_workers: int = 16) -> dict[str, int]:
    """{basename: parquet row-group count} for freshly-committed block
    files — O(batch) footer reads at COMMIT time (threaded), recorded in
    the segment so *plan* time never touches a footer again."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    def one(p: str) -> tuple[str, int]:
        return os.path.basename(p), pq.ParquetFile(p).metadata.num_row_groups

    if not paths:
        return {}
    with ThreadPoolExecutor(min(max_workers, len(paths))) as ex:
        return dict(ex.map(one, paths))
