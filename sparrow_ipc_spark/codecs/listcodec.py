"""Container codecs: general recursive list/large_list/map (``list``),
fixed-size list (``fixed_list``), the legacy list-of-primitive codec
(``list_prim``), and float byte-shuffle.

Layouts per the reference's recursive container kernels
(/root/reference/include/sparrow_ipc/array_deserializer.hpp:102-229 lists,
/root/reference/src/array_deserializer.cpp:293-387 fixed-size list,
:512-516 map): validity + offsets + recursively the child buffers; the
child gets the full codec auto-selection (a map<string,string>'s keys child
typically dictionary-encodes; an array<float> child byte-shuffles).  Child
float data byte-shuffle = byte-stream-split from the public Parquet spec.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base, forbp

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
        # arr.values keeps child slots spanned by null list entries (flatten()
        # would drop them and desync the stored offsets); rebase to offsets[0]
        child = arr.values.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
        if offsets[0]:
            offsets = offsets - offsets[0]
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
# General recursive list / large_list / map codec
# ---------------------------------------------------------------------------

def list_like(t: pa.DataType) -> bool:
    """Variable-length list layouts (map IS a list<entries struct> in Arrow,
    reference map kernel: /root/reference/src/array_deserializer.cpp:512-516)."""
    return pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_map(t)


def _canonical_offsets_child(arr: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """(int64 offsets starting at 0, child array) with null slots compacted
    to zero extent — encoded bytes must be a pure function of logical content
    (Spark task retries), so child values spanned by null slots are dropped."""
    n = len(arr)
    odt = np.int64 if pa.types.is_large_list(arr.type) else np.int32
    ab = arr.buffers()
    if ab[1] is None or n == 0:
        return np.zeros(1, dtype=np.int64), arr.values.slice(0, 0)
    off = np.frombuffer(ab[1], dtype=odt, count=n + 1).astype(np.int64)
    lens = np.diff(off)
    if arr.null_count:
        valid = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
        lens_c = np.where(valid, lens, 0)
    else:
        lens_c = lens
    new_off = np.concatenate(([0], np.cumsum(lens_c, dtype=np.int64)))
    if np.array_equal(lens_c, lens):
        return new_off, arr.values.slice(int(off[0]), int(off[-1] - off[0]))
    rep = np.repeat(off[:-1] - new_off[:-1], lens_c)
    take_idx = np.arange(int(new_off[-1]), dtype=np.int64) + rep
    return new_off, arr.values.take(pa.array(take_idx, type=pa.int64()))


def _encode_child(child: pa.Array, ctx: dict) -> base.EncodedColumn:
    from sparrow_ipc_spark.codecs import selector

    if child.offset != 0:  # nested buffer math assumes offset 0
        child = child.take(pa.array(np.arange(len(child), dtype=np.int64)))
    return selector.select_unframed(
        child, {**ctx, "col_name": f"{ctx.get('col_name', '')}.item"}
    )


def encode_list(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not list_like(arr.type):
        return None
    new_off, child = _canonical_offsets_child(arr)
    enc_child = _encode_child(child, ctx)
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    # offsets are monotonic → delta + byte-pack, same as the string codecs
    offs_enc = forbp.encode(pa.array(new_off), {"delta": True})
    for kind, b in offs_enc.buffers:
        bufs.append((f"o_{kind}", b))
    for kind, b in enc_child.buffers:
        bufs.append((f"ch_{kind}", b))
    meta = {
        "offsets_meta": offs_enc.meta,
        "n_child": len(child),
        "child_logical": base.logical_str(child.type),
        "child_codec": enc_child.codec,
        "child_meta": enc_child.meta,
    }
    return base.EncodedColumn(codec="list", meta=meta, buffers=bufs)


def decode_list(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
                ctx: dict) -> pa.Array:
    n_child = int(meta["n_child"])
    o_bufs = {k[2:]: v for k, v in buffers.items() if k.startswith("o_")}
    ch_bufs = {k[3:]: v for k, v in buffers.items() if k.startswith("ch_")}
    offs64 = base.decode_column(
        "for_bitpack", meta["offsets_meta"], o_bufs, length + 1, pa.int64(), ctx
    ).to_numpy(zero_copy_only=False).astype(np.int64)
    child_t = base.dtype_from_logical(meta["child_logical"])
    child = base.decode_column(meta["child_codec"], meta["child_meta"], ch_bufs,
                               n_child, child_t, ctx)
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    null_count = 0 if valid is None else int(length - valid.sum())
    vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    if pa.types.is_map(dtype):
        entries_t = pa.struct([
            pa.field("key", dtype.key_type, nullable=False),
            pa.field("value", dtype.item_type),
        ])
        entries = pa.StructArray.from_arrays(
            [child.field(0).cast(dtype.key_type), child.field(1).cast(dtype.item_type)],
            fields=list(entries_t),
        )
        off_buf = pa.py_buffer(offs64.astype(np.int32).tobytes())
        return pa.Array.from_buffers(dtype, length, [vbuf, off_buf], null_count,
                                     children=[entries])
    odt = np.int64 if pa.types.is_large_list(dtype) else np.int32
    if child.type != dtype.value_type:
        child = child.cast(dtype.value_type)
    off_buf = pa.py_buffer(offs64.astype(odt).tobytes())
    return pa.Array.from_buffers(dtype, length, [vbuf, off_buf], null_count,
                                 children=[child])


base.register("list", encode_list, decode_list)


# ---------------------------------------------------------------------------
# Fixed-size list codec (no offsets buffer — fixed-dim embeddings)
# ---------------------------------------------------------------------------

def fixed_applicable(arr: pa.Array) -> int:
    """Return the fixed size k (> 0) if arr can use the fixed-size layout,
    else 0.  True FSL types always qualify; variable lists qualify when
    null-free with uniform lengths (the dominant embeddings shape — the
    reference's fixed-size-list kernel, array_deserializer.cpp:293-387)."""
    t = arr.type
    if pa.types.is_fixed_size_list(t):
        return int(t.list_size)
    if not (pa.types.is_list(t) or pa.types.is_large_list(t)):
        return 0
    n = len(arr)
    if n == 0 or arr.null_count:
        return 0
    ab = arr.buffers()
    if ab[1] is None:
        return 0
    odt = np.int64 if pa.types.is_large_list(t) else np.int32
    off = np.frombuffer(ab[1], dtype=odt, count=n + 1)
    lens = np.diff(off)
    k = int(lens[0])
    return k if (k > 0 and bool((lens == k).all())) else 0


def encode_fixed(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    k = fixed_applicable(arr)
    if k == 0:
        return None
    n = len(arr)
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    if pa.types.is_fixed_size_list(arr.type):
        child = arr.values.slice(arr.offset * k, n * k)
        if arr.null_count:
            # canonicalize child slots under null list entries (determinism):
            # take with null indices nulls the slots for EVERY child type
            # (pc.if_else has no kernel for nested children like map)
            valid = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
            idx = np.arange(n * k, dtype=np.int64)
            child = child.take(pa.array(idx, mask=np.repeat(~valid, k)))
    else:
        _, child = _canonical_offsets_child(arr)
    enc_child = _encode_child(child, ctx)
    for kind, b in enc_child.buffers:
        bufs.append((f"ch_{kind}", b))
    meta = {
        "k": k,
        "n_child": n * k,
        "child_logical": base.logical_str(child.type),
        "child_codec": enc_child.codec,
        "child_meta": enc_child.meta,
    }
    return base.EncodedColumn(codec="fixed_list", meta=meta, buffers=bufs)


def decode_fixed(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
                 ctx: dict) -> pa.Array:
    k = int(meta["k"])
    n_child = int(meta["n_child"])
    ch_bufs = {k2[3:]: v for k2, v in buffers.items() if k2.startswith("ch_")}
    child_t = base.dtype_from_logical(meta["child_logical"])
    child = base.decode_column(meta["child_codec"], meta["child_meta"], ch_bufs,
                               n_child, child_t, ctx)
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    if pa.types.is_fixed_size_list(dtype):
        if child.type != dtype.value_type:
            child = child.cast(dtype.value_type)
        null_count = 0 if valid is None else int(length - valid.sum())
        vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(dtype, length, [vbuf], null_count, children=[child])
    # variable-list logical type stored fixed (null-free by applicability)
    fsl = pa.FixedSizeListArray.from_arrays(child, k)
    return fsl.cast(dtype)


base.register("fixed_list", encode_fixed, decode_fixed)


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
