"""Frame-of-reference + bit-packing codec for integer-like columns,
with optional delta pre-transform for monotonic sequences (turn_idx, ts).

Not present in the reference (it only has LZ4/ZSTD general compression,
/root/reference/src/compression.cpp:127-154); this is one of the
north-star lightweight codecs.  Semantics follow the classic FoR scheme:
``u[i] = v[i] - min(v)`` packed at the minimal bit width; delta mode stores
``first`` and packs ``diff(v)`` instead.  All arithmetic is mod-2^64
wrapping (numpy C semantics) on both sides, so any int64 range round-trips
exactly.  Null slots are canonicalized to 0 before packing; logical nulls
are restored from the validity bitmap (the reference likewise treats null
slots as non-semantic and recomputes null counts from bitmaps,
/root/reference/src/deserialize_utils.cpp:9-28).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base

_MASK64 = 0xFFFFFFFFFFFFFFFF


def _int64_values(arr: pa.Array) -> np.ndarray:
    """Exact int64 bit view with null slots = 0 (no float round-trip;
    uint64 above 2^63 preserved by reinterpretation, wrapping math below)."""
    storage = arr
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_duration(t) or pa.types.is_time64(t) or pa.types.is_date64(t):
        storage = arr.cast(pa.int64())
    elif pa.types.is_date32(t) or pa.types.is_time32(t):
        storage = arr.cast(pa.int32())
    if storage.null_count:
        storage = storage.fill_null(0)
    if pa.types.is_unsigned_integer(storage.type):
        v = storage.to_numpy(zero_copy_only=False).astype(np.uint64).view(np.int64)
    else:
        v = storage.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return np.ascontiguousarray(v, dtype=np.int64)


def applicable(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date(t)
        or pa.types.is_duration(t) or pa.types.is_time(t)
    )


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type):
        return None
    n = len(arr)
    delta = bool(ctx.get("delta", False))
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    v = _int64_values(arr)
    meta: dict = {"n": n, "delta": delta}
    if n == 0:
        meta.update(ref=0, width=0, first=0)
        return base.EncodedColumn(codec="for_bitpack", meta=meta, buffers=bufs)
    if delta:
        meta["first"] = int(v[0])
        e = np.diff(v)
    else:
        meta["first"] = 0
        e = v
    if len(e) == 0:
        meta.update(ref=0, width=0)
        return base.EncodedColumn(codec="for_bitpack", meta=meta, buffers=bufs)
    ref = int(e.min())
    u = e.view(np.uint64) - np.uint64(ref & _MASK64)  # wrapping: exact mod 2^64
    width = base.bit_width(u)
    # sub-byte bit-packing only where the dense bit matrix is cheap (≤8
    # bits); wider values use byte-aligned packing (memcpy-speed) and let
    # the zstd stage squeeze the ≤7 bits/value of high-zero slack
    if width <= 8:
        meta.update(ref=ref, width=width, pack="bits")
        if width:
            bufs.append(("packed", base.bitpack(u, width)))
    else:
        nbytes = (width + 7) // 8
        meta.update(ref=ref, width=nbytes * 8, pack="bytes")
        bufs.append(("packed", base.bytepack(u, nbytes)))
    return base.EncodedColumn(codec="for_bitpack", meta=meta, buffers=bufs)


def _cast_back(v: np.ndarray, dtype: pa.DataType, valid: np.ndarray | None) -> pa.Array:
    if (pa.types.is_timestamp(dtype) or pa.types.is_duration(dtype)
            or pa.types.is_time64(dtype) or pa.types.is_date64(dtype)):
        out = pa.array(v).cast(dtype)
    elif pa.types.is_date32(dtype) or pa.types.is_time32(dtype):
        out = pa.array(v.astype(np.int32)).cast(dtype)
    elif pa.types.is_unsigned_integer(dtype):
        np_dt = {"uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32,
                 "uint64": np.uint64}[str(dtype)]
        out = pa.array(v.view(np.uint64).astype(np_dt), type=dtype)
    else:
        np_dt = {"int8": np.int8, "int16": np.int16, "int32": np.int32, "int64": np.int64}[str(dtype)]
        out = pa.array(v.astype(np_dt), type=dtype)
    return base.rebuild_with_validity(out, valid)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    n = int(meta["n"])
    assert n == length
    if n == 0:
        return pa.array([], type=dtype)
    delta = bool(meta["delta"])
    width = int(meta["width"])
    m = (n - 1) if delta else n
    if meta.get("pack", "bits") == "bytes":
        u = base.byteunpack(buffers.get("packed", b""), m, width // 8)
    else:
        u = base.bitunpack(buffers.get("packed", b""), m, width)
    e = (u + np.uint64(int(meta["ref"]) & _MASK64)).astype(np.uint64)
    if delta:
        first = np.uint64(int(meta["first"]) & _MASK64)
        v = np.concatenate(([first], first + np.cumsum(e, dtype=np.uint64))).view(np.int64)
    else:
        v = e.view(np.int64)
    return _cast_back(v, dtype, valid)


base.register("for_bitpack", encode, decode)
