"""Block assembly/disassembly: one encoded block row per Arrow batch.

The block row is the Spark-native ``Message{header=RecordBatch}``:
``field_nodes`` (length, null_count per column, /root/reference/src/
flatbuffer_utils.cpp:746-769), ``buffers`` (col_idx, kind, codec, offset,
comp_len, uncomp_len — the Buffer descriptor list with 8-byte aligned
offsets, include/sparrow_ipc/flatbuffer_utils.hpp:188-226), and ``body``
(depth-first concatenation of framed buffers, each padded to 8 bytes,
src/serialize_utils.cpp:12-40).  Decode walks ``buffers`` in depth-first
order with a cursor, exactly the reference's deserialization_context
contract (include/sparrow_ipc/deserialization_context.hpp:32-52).
"""

from __future__ import annotations

import json
import zlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sparrow_ipc_spark.codecs import base, selector

# pandas → arrow conversion types for the encode UDF entry point
def arrow_type_of(logical: str) -> pa.DataType:
    return base.dtype_from_logical(logical)


def _canonical(arr: pa.Array, target: pa.DataType) -> pa.Array:
    """Zero-offset, target-typed array (buffer math assumes offset 0)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type != target:
        arr = arr.cast(target)
    if arr.offset != 0:
        # force a compaction copy (rare: Spark delivers offset-0 batches)
        arr = pa.concat_arrays([arr])
        if arr.offset != 0:
            arr = arr.take(pa.array(range(len(arr)), type=pa.int64()))
    return arr


_Z_EMPTY = {"zmin_int": None, "zmax_int": None, "zmin_num": None,
            "zmax_num": None, "zmin_str": None, "zmax_str": None}


def zone_stats(arr: pa.Array) -> dict:
    """Per-column zone-map stats (typed min/max), null = don't prune.

    The generalization of the conv/ts zone maps to every orderable column —
    block-level skipping for arbitrary decode predicates (Footer-index
    analog, /root/reference/src/stream_file_serializer.cpp:77-129)."""
    out = dict(_Z_EMPTY)
    t = arr.type
    if len(arr) == 0 or arr.null_count == len(arr):
        return out
    try:
        if (pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date(t)
                or pa.types.is_duration(t) or pa.types.is_time(t)):
            from sparrow_ipc_spark.codecs import forbp

            v = forbp._int64_values(arr.drop_null())
            if pa.types.is_unsigned_integer(t) and (v < 0).any():
                return out  # uint64 above 2^63: int64 stats would lie
            out["zmin_int"], out["zmax_int"] = int(v.min()), int(v.max())
        elif pa.types.is_floating(t):
            mm = pc.min_max(arr)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo == lo and hi == hi:  # skip NaN-poisoned stats
                out["zmin_num"], out["zmax_num"] = float(lo), float(hi)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            # only key-like strings: range predicates on free text don't
            # exist, and min/max over megabytes of prose is pure overhead
            from sparrow_ipc_spark.codecs.selector import _data_bytes

            if _data_bytes(arr) <= 64 * len(arr):
                mm = pc.min_max(arr)
                out["zmin_str"], out["zmax_str"] = mm["min"].as_py(), mm["max"].as_py()
    except Exception:
        return dict(_Z_EMPTY)  # stats are an optimization, never a failure
    return out


def encode_batch_arrow(
    batch: pa.RecordBatch,
    fields: list[tuple[str, str]],
    ctx: dict,
    part_id: int,
    batch_seq: int,
) -> dict:
    """Encode one Arrow batch into one block row (dict matching BLOCK_SCHEMA).

    Pure-Arrow path (no pandas object materialization): columns come in as
    pa arrays and go straight to the codec kernels."""
    n = batch.num_rows
    field_nodes, columns, buf_rows = [], [], []
    body = bytearray()
    dict_refs: set[int] = set()
    raw_bytes = 0
    enc_bytes = 0
    name_to_col = {batch.schema.field(i).name: batch.column(i) for i in range(batch.num_columns)}
    arrays: dict[str, pa.Array] = {}
    for col_idx, (name, logical) in enumerate(fields):
        arr = _canonical(name_to_col[name], arrow_type_of(logical))
        arrays[name] = arr
        choice = selector.select_and_encode(arr, {**ctx, "col_name": name})
        enc = choice.encoded
        field_nodes.append({"name": name, "length": len(arr), "null_count": arr.null_count})
        columns.append(
            {
                "name": name,
                "logical_type": logical,
                "codec": enc.codec,
                "meta_json": json.dumps(enc.meta, separators=(",", ":")),
                **zone_stats(arr),
            }
        )
        if enc.codec == "dict":
            dict_refs.add(int(enc.meta["dict_id"]))
        for (kind, payload), (_, gcodec, framed) in zip(enc.buffers, choice.framed):
            offset = len(body)
            buf_rows.append(
                {
                    "col_idx": col_idx,
                    "kind": kind,
                    "codec": gcodec,
                    "offset": offset,
                    "comp_len": len(framed),
                    "uncomp_len": len(payload),
                }
            )
            body += base.pad8(framed)
        raw_bytes += choice.raw_bytes
        enc_bytes += choice.enc_bytes
    conv_min = conv_max = None
    ts_min = ts_max = None
    if n and "conv_id" in arrays:
        mm = pc.min_max(arrays["conv_id"])
        conv_min, conv_max = mm["min"].as_py(), mm["max"].as_py()
    if n and "ts" in arrays and pa.types.is_timestamp(arrays["ts"].type):
        mm = pc.min_max(arrays["ts"].cast(pa.int64()))
        ts_min, ts_max = mm["min"].as_py(), mm["max"].as_py()
    body_b = bytes(body)
    return {
        "part_id": part_id,
        "batch_seq": batch_seq,
        "n_rows": n,
        "field_nodes": field_nodes,
        "columns": columns,
        "buffers": buf_rows,
        "dict_refs": sorted(dict_refs),
        "conv_min": conv_min,
        "conv_max": conv_max,
        "ts_min_us": ts_min,
        "ts_max_us": ts_max,
        "body": body_b,
        "body_crc32": zlib.crc32(body_b),
        "raw_bytes": raw_bytes,
        "enc_bytes": enc_bytes,
    }


def encode_batch(
    pdf: pd.DataFrame,
    fields: list[tuple[str, str]],
    ctx: dict,
    part_id: int,
    batch_seq: int,
) -> dict:
    """Pandas entry point: convert and delegate to :func:`encode_batch_arrow`
    — the arrow path is the single production kernel (a second hand-rolled
    copy of the block-assembly logic had already drifted in its zone-stat
    handling before being collapsed into this delegation)."""
    arrays = [pa.Array.from_pandas(pdf[name], type=arrow_type_of(logical))
              for name, logical in fields]
    batch = pa.record_batch(arrays, names=[n for n, _ in fields])
    return encode_batch_arrow(batch, fields, ctx, part_id, batch_seq)


def decode_block(row: dict, ctx: dict, columns: list[str] | None = None) -> pa.Table:
    """Inverse of encode_batch: block row → pyarrow Table.

    ``columns`` prunes decode to the requested columns: buffers of other
    columns are never decompressed or decoded (the columnar payoff of
    per-buffer descriptors — the reference's positional cursor walk,
    deserialization_context.hpp:32-52, generalized to random access).
    """
    n = int(row["n_rows"])
    body = row["body"]  # bytes or a zero-copy memoryview over the Arrow buffer
    if "body_crc32" in row and row["body_crc32"] is not None:
        if zlib.crc32(body) != int(row["body_crc32"]):
            raise ValueError(
                f"block (part={row.get('part_id')}, seq={row.get('batch_seq')}) "
                "body checksum mismatch — corrupted block"
            )
    col_descs = row["columns"]
    wanted = (
        set(range(len(col_descs)))
        if columns is None
        else {i for i, c in enumerate(col_descs) if c["name"] in columns}
    )
    # group buffer descriptors by column, preserving depth-first order
    per_col: dict[int, dict[str, bytes]] = {}
    for b in row["buffers"]:
        ci = int(b["col_idx"])
        if ci not in wanted:
            continue
        off, clen = int(b["offset"]), int(b["comp_len"])
        framed = bytes(body[off : off + clen])
        payload = base.decompress_buffer(framed, b["codec"])
        if len(payload) != int(b["uncomp_len"]):
            raise ValueError(
                f"buffer {b['kind']} uncompressed size {len(payload)} != {b['uncomp_len']}"
            )
        per_col.setdefault(ci, {})[b["kind"]] = payload
    arrays, names = [], []
    for col_idx, col in enumerate(col_descs):
        if col_idx not in wanted:
            continue
        meta = json.loads(col["meta_json"])
        dtype = base.dtype_from_logical(col["logical_type"])
        arr = base.decode_column(
            col["codec"], meta, per_col.get(col_idx, {}), n, dtype, ctx
        )
        arrays.append(arr)
        names.append(col["name"])
    if columns is not None:
        order = [c for c in columns if c in names]
        arrays = [arrays[names.index(c)] for c in order]
        names = order
    return pa.table(arrays, names=names)
