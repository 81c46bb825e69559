"""List-of-primitive codec (embeddings: array<float>) + float byte-shuffle.

List layout per the reference's list kernel
(/root/reference/include/sparrow_ipc/array_deserializer.hpp:102-229):
validity + int32 offsets + recursively the child buffers; child length =
offsets[-1].  Child float data is byte-shuffled (bytes of each value
transposed into per-byte planes) before the general compression stage —
exponent/sign planes are highly compressible even when mantissas are not
(the classic byte-stream-split encoding from Parquet, public spec).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base

_CHILD_DTYPES = {
    "float": (np.float32, pa.float32()),
    "double": (np.float64, pa.float64()),
    "int32": (np.int32, pa.int32()),
    "int64": (np.int64, pa.int64()),
}


def byteshuffle(data: bytes, itemsize: int) -> bytes:
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a) // itemsize
    if n == 0:
        return data
    return np.ascontiguousarray(a[: n * itemsize].reshape(n, itemsize).T).tobytes() + bytes(
        a[n * itemsize :]
    )


def byteunshuffle(data: bytes, itemsize: int) -> bytes:
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a) // itemsize
    if n == 0:
        return data
    return np.ascontiguousarray(a[: n * itemsize].reshape(itemsize, n).T).tobytes() + bytes(
        a[n * itemsize :]
    )


def applicable(t: pa.DataType) -> bool:
    return pa.types.is_list(t) and str(t.value_type) in _CHILD_DTYPES


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type):
        return None
    n = len(arr)
    child_t = str(arr.type.value_type)
    np_dt, _ = _CHILD_DTYPES[child_t]
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    ab = arr.buffers()
    if ab[1] is None or n == 0:
        offsets = np.zeros(1, dtype=np.int32)
        child = pa.array([], type=arr.type.value_type)
    else:
        offsets = np.frombuffer(ab[1], dtype=np.int32, count=n + 1).copy()
        child = arr.flatten()
    bufs.append(("offsets", offsets.tobytes()))
    cvb = base.validity_bytes(child)
    if cvb is not None:
        bufs.append(("child_validity", cvb))
    filled = child.fill_null(0) if child.null_count else child
    cdata = np.ascontiguousarray(
        filled.to_numpy(zero_copy_only=False), dtype=np_dt
    ).tobytes()
    itemsize = np.dtype(np_dt).itemsize
    shuffled = child_t in ("float", "double")
    bufs.append(("child_data", byteshuffle(cdata, itemsize) if shuffled else cdata))
    meta = {"child_type": child_t, "n_child": len(child), "shuffled": shuffled}
    return base.EncodedColumn(codec="list_prim", meta=meta, buffers=bufs)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    child_t = str(meta["child_type"])
    np_dt, pa_dt = _CHILD_DTYPES[child_t]
    n_child = int(meta["n_child"])
    itemsize = np.dtype(np_dt).itemsize
    raw = buffers.get("child_data", b"")
    if bool(meta.get("shuffled")):
        raw = byteunshuffle(raw, itemsize)
    child_vals = np.frombuffer(raw, dtype=np_dt, count=n_child)
    cvalid = base.validity_from_bytes(buffers.get("child_validity"), n_child)
    child = base.rebuild_with_validity(pa.array(child_vals, type=pa_dt), cvalid)
    offsets = np.frombuffer(buffers["offsets"], dtype=np.int32)
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), child)
    if valid is not None:
        import pyarrow.compute as pc

        lst = pc.if_else(pa.array(valid), lst, pa.scalar(None, type=lst.type))
    if lst.type != dtype:
        lst = lst.cast(dtype)
    return lst


base.register("list_prim", encode, decode)


# ---------------------------------------------------------------------------
# Flat float byte-shuffle codec (byte-stream-split for float32/float64)
# ---------------------------------------------------------------------------

def encode_float_shuffle(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    t = arr.type
    if not (pa.types.is_float32(t) or pa.types.is_float64(t)):
        return None
    np_dt = np.float32 if pa.types.is_float32(t) else np.float64
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    filled = arr.fill_null(0.0) if arr.null_count else arr
    data = np.ascontiguousarray(filled.to_numpy(zero_copy_only=False), dtype=np_dt).tobytes()
    itemsize = np.dtype(np_dt).itemsize
    bufs.append(("data", byteshuffle(data, itemsize)))
    return base.EncodedColumn(codec="float_shuffle", meta={"itemsize": itemsize}, buffers=bufs)


def decode_float_shuffle(meta: dict, buffers: dict[str, bytes], length: int,
                         dtype: pa.DataType, ctx: dict) -> pa.Array:
    itemsize = int(meta["itemsize"])
    np_dt = np.float32 if itemsize == 4 else np.float64
    data = byteunshuffle(buffers.get("data", b""), itemsize)
    vals = np.frombuffer(data, dtype=np_dt, count=length)
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    return base.rebuild_with_validity(pa.array(vals, type=dtype), valid)


base.register("float_shuffle", encode_float_shuffle, decode_float_shuffle)
