"""Dictionary codec: global (emit-once dictionary table) and block-local.

Global mode is the Spark reimagination of the reference's dictionary
machinery: a separate distinct-build stage assigns codes once, the
dictionary is broadcast, and every block stores only int32 indices
referencing ``dict_id`` — the analog of DictionaryBatch messages emitted
exactly once before record batches (/root/reference/src/dictionary_tracker.cpp:
233-307 extraction + emit-once; Message.fbs:129-131).  ``dict_id`` is a
deterministic hash of the column name (the reference's fallback id is
hash(field_name, index), /root/reference/src/dictionary_utils.cpp:15-23).

Local mode stores the chunk's own distinct values inside the block
(values offsets+data sub-buffers), for columns whose dictionary was not
pre-built.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sparrow_ipc_spark.codecs import base


def dict_id_for(col_name: str) -> int:
    """Deterministic 63-bit dictionary id from the column name."""
    h = hashlib.sha1(col_name.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "little") & 0x7FFFFFFFFFFFFFFF


def _index_width(n_dict: int) -> int:
    """Bytes per index: smallest width that addresses the dictionary."""
    return max(1, ((max(n_dict - 1, 0)).bit_length() + 7) // 8)


def _indices_bytes(arr: pa.Array, values: pa.Array) -> tuple[bytes, bytes | None, bool]:
    """(byte-packed index bytes, validity bytes, ok) — vectorized lookup;
    indices stored at the minimal byte width for the dictionary size."""
    codes = pc.index_in(arr, value_set=values)
    # a non-null value missing from the dictionary is a contract violation
    if arr.null_count != codes.null_count:
        return b"", None, False
    vb = base.validity_bytes(codes)
    filled = codes.fill_null(0).cast(pa.int64())
    u = np.ascontiguousarray(
        filled.to_numpy(zero_copy_only=False), dtype=np.int64
    ).view(np.uint64)
    return base.bytepack(u, _index_width(len(values))), vb, True


def encode_global(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    col = ctx.get("col_name")
    gdicts = ctx.get("global_dicts") or {}
    if col not in gdicts:
        return None
    entry = gdicts[col]  # {"dict_id": int, "values": pa.Array}
    idx_bytes, vb, ok = _indices_bytes(arr, entry["values"])
    if not ok:
        return None
    bufs: list[tuple[str, bytes]] = []
    if vb is not None:
        bufs.append(("validity", vb))
    bufs.append(("indices", idx_bytes))
    return base.EncodedColumn(
        codec="dict", meta={"dict_id": entry["dict_id"], "n_dict": len(entry["values"])},
        buffers=bufs,
    )


def encode_local(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if len(arr) == 0:
        return None
    values = arr.drop_null().unique()
    if len(values) == 0:
        values = pa.array([], type=arr.type)
    idx_bytes, vb, ok = _indices_bytes(arr, values)
    if not ok:
        return None
    bufs: list[tuple[str, bytes]] = []
    if vb is not None:
        bufs.append(("validity", vb))
    bufs.append(("indices", idx_bytes))
    # dictionary values ride inside the block as offsets+data sub-buffers;
    # offsets at the values type's native width (int64 for large_string)
    large = pa.types.is_large_string(values.type) or pa.types.is_large_binary(values.type)
    odt = np.int64 if large else np.int32
    voff = values.buffers()[1]
    vdat = values.buffers()[2]
    n = len(values)
    if voff is None:
        offsets = np.zeros(1, dtype=odt)
        data = b""
    else:
        offsets = np.frombuffer(voff, dtype=odt, count=n + 1)
        data = vdat.slice(0, int(offsets[-1])).to_pybytes() if vdat is not None else b""
    bufs.append(("dict_offsets", offsets.tobytes()))
    bufs.append(("dict_data", data))
    return base.EncodedColumn(codec="dict_local", meta={"n_dict": n}, buffers=bufs)


def _take_with_validity(values: pa.Array, buffers: dict[str, bytes], length: int,
                        n_dict: int) -> pa.Array:
    """``n_dict`` is the ENCODE-time dictionary size from block meta — the
    decode-time ``values`` may be larger (delta dictionaries appended after
    this block was written), and the index byte width is fixed at encode."""
    raw_idx = buffers["indices"]
    width = _index_width(n_dict)
    if len(raw_idx) != width * length and len(raw_idx) == 4 * length:
        idx = np.frombuffer(raw_idx, dtype=np.int32, count=length).astype(np.int64)  # legacy int32
    else:
        idx = base.byteunpack(raw_idx, length, width).view(np.int64)
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    if valid is None:
        indices = pa.array(idx, type=pa.int64())
    else:
        indices = pa.array(idx, type=pa.int64(), mask=~valid)
    return values.take(indices)  # null index → null output


def decode_global(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
                  ctx: dict) -> pa.Array:
    values = ctx["dict_values"][int(meta["dict_id"])]
    if values.type != dtype:
        values = values.cast(dtype)
    return _take_with_validity(values, buffers, length, int(meta["n_dict"]))


def decode_local(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
                 ctx: dict) -> pa.Array:
    n = int(meta["n_dict"])
    large = pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype)
    odt = np.int64 if large else np.int32
    storage_t = dtype if (pa.types.is_string(dtype) or pa.types.is_large_string(dtype)
                          or pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype)) else pa.string()
    offsets = np.frombuffer(buffers["dict_offsets"], dtype=odt)
    data = buffers.get("dict_data", b"")
    values = pa.Array.from_buffers(
        storage_t, n, [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)], 0
    )
    if values.type != dtype:
        values = values.cast(dtype)
    return _take_with_validity(values, buffers, length, n)


base.register("dict", encode_global, decode_global)
base.register("dict_local", encode_local, decode_local)
