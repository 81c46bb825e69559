"""Block compaction: merge undersized blocks into full ones.

Streaming appends (micro-batches) and resumed runs leave small blocks —
each block carries fixed metadata (schema descriptors, framing headers,
symbol tables) and small chunks compress worse, so at 10^12-turn scale
the block-size distribution must be maintainable.  Compaction decodes
only the undersized blocks, re-encodes them clustered at full batch size,
and rewrites the block table; committed dictionaries are REUSED verbatim
(code assignment preserved — the delta-merge invariant,
/root/reference/src/dictionary_cache.cpp:20-111), so untouched blocks
stay byte-identical and no dictionary rows change.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from sparrow_ipc_spark.operators.decode_job import decode_blocks
from sparrow_ipc_spark.operators.encode_job import (
    encode_transcripts,
    payload_from_dict_rows,
)
from sparrow_ipc_spark.schema import TRANSCRIPTS_SCHEMA


def compact_blocks(
    spark: SparkSession,
    out_dir: str,
    small_rows: int = 8192,
    target_rows: int = 65536,
    schema=None,
    dict_cols=None,
) -> dict:
    """Merge blocks with fewer than ``small_rows`` rows into ~``target_rows``
    blocks.  Returns {before, after, compacted, rows_moved}.

    ``schema=None`` resolves the directory's ``_schema.json`` sidecar (any
    ``encode_table``-written dir compacts without arguments); clustering
    keys come from ``_job.json`` when present, falling back to
    conv_id/turn_idx if those columns exist, else a shuffle-free re-batch.

    NOTE: the directory swap uses local-filesystem renames — compaction of
    an object-store (s3a/hdfs) table needs a FileSystem-API commit instead;
    every other job in the engine is URI-agnostic."""
    from sparrow_ipc_spark.sources.manifest import acquire_commit_lease

    # the lease is held for the WHOLE compaction — from the first read of
    # block state through the swap — not just around the swap: the staged
    # rewrite and the minted part_offset are snapshots of committed state,
    # and an append committed mid-staging would be silently destroyed by a
    # swap based on a stale snapshot.  Compaction can run for minutes, so
    # the heartbeat keeps the lease fresh; concurrent appenders simply
    # queue on it (offline maintenance vs. ingest — the queueing is the
    # design, a catalog CAS would force the same serialization).
    lease = acquire_commit_lease(out_dir)
    lease.start_heartbeat()
    try:
        return _compact_under_lease(spark, out_dir, small_rows, target_rows,
                                    schema, dict_cols, lease)
    finally:
        lease.release()


def _compact_under_lease(spark, out_dir, small_rows, target_rows, schema,
                         dict_cols, lease) -> dict:
    import json as _json

    from sparrow_ipc_spark.operators.encode_job import load_schema_sidecar

    if schema is None:
        schema = load_schema_sidecar(out_dir) or TRANSCRIPTS_SCHEMA
    job: dict = {}
    jp = os.path.join(out_dir, "_job.json")
    if os.path.isfile(jp):
        with open(jp) as jf:
            job = _json.load(jf)
    blocks = spark.read.parquet(f"{out_dir}/blocks")
    # scalar aggregates only — collecting per-block metadata rows to the
    # driver would be O(blocks) dicts (~15M at 10^12 turns)
    agg = blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("part_id").alias("max_part"),
        F.sum((F.col("n_rows") < small_rows).cast("long")).alias("n_small"),
    ).first()
    before = int(agg["n_blocks"] or 0)
    small = blocks.where(F.col("n_rows") < small_rows)
    n_small = int(agg["n_small"] or 0)
    if n_small <= 1:
        return {"before": before, "after": before, "compacted": 0, "rows_moved": 0}

    dict_rows = [r.asDict() for r in spark.read.parquet(f"{out_dir}/dictionaries").collect()]
    payload = payload_from_dict_rows(dict_rows)
    dec = decode_blocks(spark, small, dict_rows, schema=schema)
    rows_moved = dec.count()
    part_offset = int(agg["max_part"]) + 1
    n_parts = max(1, (rows_moved + target_rows - 1) // target_rows)
    cols = tuple(payload.keys()) if dict_cols is None else tuple(dict_cols)
    names = [f.name for f in schema.fields]
    cluster_by = job.get("cluster_by") if job.get("cluster_by") in names else (
        "conv_id" if "conv_id" in names else None)
    order_by = job.get("order_by") if job.get("order_by") in names else (
        "turn_idx" if "turn_idx" in names else None)
    if cluster_by:
        new_blocks, _, _ = encode_transcripts(
            spark, dec, n_parts=n_parts, dict_cols=cols, dict_payload=payload,
            part_offset=part_offset, cluster_by=cluster_by, order_by=order_by,
        )
    else:  # generic table: shuffle-free re-batch into right-sized blocks
        new_blocks, _, _ = encode_transcripts(
            spark, dec.repartition(n_parts), dict_cols=cols,
            dict_payload=payload, part_offset=part_offset, clustered=True,
        )
    keep = blocks.where(F.col("n_rows") >= small_rows)
    combined = keep.unionByName(new_blocks)

    # parquet dirs are immutable while read: stage the rewrite, then swap.
    # The caller's lease has been held since before the first state read,
    # so no append can have committed into the dir being renamed away;
    # assert it right before the destructive swap all the same.
    tmp = f"{out_dir}/blocks_compact_{uuid.uuid4().hex[:8]}"
    combined.write.mode("overwrite").option("compression", "snappy").parquet(tmp)  # bodies pre-zstd'd
    lease.assert_owned()
    old = f"{out_dir}/blocks_old_{uuid.uuid4().hex[:8]}"
    os.rename(f"{out_dir}/blocks", old)
    os.rename(tmp, f"{out_dir}/blocks")
    shutil.rmtree(old, ignore_errors=True)
    return _finish_compact(spark, out_dir, before, n_small, rows_moved)


def _finish_compact(spark: SparkSession, out_dir: str, before: int,
                    n_small: int, rows_moved: int) -> dict:

    # compaction is a REWRITE: compacted part files are gone, so time travel
    # reaches back only to this new snapshot for the merged rows; untouched
    # parts keep their original snapshot lineage.  The manifest is rebuilt
    # as ONE merged segment — block compaction is inherently O(table), so
    # a full manifest rewrite costs nothing extra here (the per-batch
    # commit path stays O(batch) append-only).
    from sparrow_ipc_spark.sources import manifest as M

    try:
        prev_man = {
            int(r["part_id"]): int(r.get("snapshot", 0) or 0)
            for r in M.read_manifest_rows(out_dir)
        }
    except Exception:
        prev_man = {}
    next_snap = (max(prev_man.values()) + 1) if prev_man else 0
    bd = f"{out_dir}/blocks"
    all_files = sorted(f for f in os.listdir(bd) if f.endswith(".parquet"))
    man_rows = M.manifest_rows_for_new_files(spark, bd, all_files, next_snap)
    for r in man_rows:
        # untouched parts keep their original snapshot lineage; only the
        # merged (rewritten) parts get the new snapshot
        r["snapshot"] = prev_man.get(int(r["part_id"]), next_snap)
    M.rewrite_manifest(out_dir, man_rows)
    after = sum(int(r["n_blocks"]) for r in man_rows)
    return {
        "before": before,
        "after": after,
        "compacted": int(n_small),
        "rows_moved": int(rows_moved),
    }
