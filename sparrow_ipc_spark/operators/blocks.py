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

import pandas as pd
import pyarrow as pa

from sparrow_ipc_spark.codecs import base, selector

# pandas → arrow conversion types for the encode UDF entry point
def arrow_type_of(logical: str) -> pa.DataType:
    return base.dtype_from_logical(logical)


def encode_batch(
    pdf: pd.DataFrame,
    fields: list[tuple[str, str]],
    ctx: dict,
    part_id: int,
    batch_seq: int,
) -> dict:
    """Encode one pandas batch into one block row (dict matching BLOCK_SCHEMA)."""
    n = len(pdf)
    field_nodes, columns, buf_rows = [], [], []
    body = bytearray()
    dict_refs: set[int] = set()
    raw_bytes = 0
    enc_bytes = 0
    for col_idx, (name, logical) in enumerate(fields):
        arr = pa.Array.from_pandas(pdf[name], type=arrow_type_of(logical))
        choice = selector.select_and_encode(arr, {**ctx, "col_name": name})
        enc = choice.encoded
        field_nodes.append({"name": name, "length": len(arr), "null_count": arr.null_count})
        columns.append(
            {
                "name": name,
                "logical_type": logical,
                "codec": enc.codec,
                "meta_json": json.dumps(enc.meta, separators=(",", ":")),
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
    return {
        "part_id": part_id,
        "batch_seq": batch_seq,
        "n_rows": n,
        "field_nodes": field_nodes,
        "columns": columns,
        "buffers": buf_rows,
        "dict_refs": sorted(dict_refs),
        "body": bytes(body),
        "raw_bytes": raw_bytes,
        "enc_bytes": enc_bytes,
    }


def decode_block(row: dict, ctx: dict) -> pa.Table:
    """Inverse of encode_batch: block row → pyarrow Table."""
    n = int(row["n_rows"])
    body = row["body"]
    columns = row["columns"]
    # group buffer descriptors by column, preserving depth-first order
    per_col: dict[int, dict[str, bytes]] = {}
    for b in row["buffers"]:
        off, clen = int(b["offset"]), int(b["comp_len"])
        framed = bytes(body[off : off + clen])
        payload = base.decompress_buffer(framed, b["codec"])
        if len(payload) != int(b["uncomp_len"]):
            raise ValueError(
                f"buffer {b['kind']} uncompressed size {len(payload)} != {b['uncomp_len']}"
            )
        per_col.setdefault(int(b["col_idx"]), {})[b["kind"]] = payload
    arrays, names = [], []
    for col_idx, col in enumerate(columns):
        meta = json.loads(col["meta_json"])
        dtype = base.dtype_from_logical(col["logical_type"])
        arr = base.decode_column(
            col["codec"], meta, per_col.get(col_idx, {}), n, dtype, ctx
        )
        arrays.append(arr)
        names.append(col["name"])
    return pa.table(arrays, names=names)
