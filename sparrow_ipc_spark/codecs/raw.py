"""Raw (passthrough) column codec: the array's canonical Arrow buffers.

Mirrors the reference's uncompressed body layout — per column, depth-first:
validity bitmap, offsets, data (/root/reference/src/serialize_utils.cpp:12-40
``fill_body``; decode /root/reference/src/deserialize_variable_size_binary_array.hpp:16-79
and deserialize_primitive_array.hpp:14-25).  Null slots in primitive data are
canonicalized to 0 so encoded bytes are a pure function of logical content
(task retries must be deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base


def _offsets_width(t: pa.DataType) -> int:
    return 8 if (pa.types.is_large_string(t) or pa.types.is_large_binary(t)) else 4


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    t = arr.type
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    n = len(arr)
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        w = _offsets_width(t)
        ab = arr.buffers()
        if ab[1] is None or n == 0:
            offs = np.zeros(1, dtype=np.int64 if w == 8 else np.int32)
            data = b""
        else:
            odt = np.int64 if w == 8 else np.int32
            offs = np.frombuffer(ab[1], dtype=odt, count=n + 1)
            data = ab[2].slice(0, int(offs[-1])).to_pybytes() if ab[2] is not None else b""
        # offsets are monotonic → delta + byte-pack (string lengths are
        # small ints); ~4× smaller than plain int32 even after zstd
        from sparrow_ipc_spark.codecs import forbp

        offs_enc = forbp.encode(pa.array(offs.astype(np.int64)), {"delta": True})
        for kind, b in offs_enc.buffers:
            bufs.append((f"o_{kind}", b))
        meta = {"offsets_meta": offs_enc.meta}
        bufs.append(("data", data))
        return base.EncodedColumn(codec="raw", meta=meta, buffers=bufs)
    elif pa.types.is_interval(t):
        # month_day_nano interval: fixed 16-byte (i32 months, i32 days,
        # i64 nanos) — reference kernel deserialize_interval_array.hpp:12-19
        ab = arr.buffers()
        if ab[1] is None or n == 0:
            data = b""
        else:
            v = np.frombuffer(ab[1], dtype=np.uint8,
                              count=(arr.offset + n) * 16)[arr.offset * 16 :].reshape(n, 16).copy()
            if arr.null_count:
                valid = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
                v[~valid] = 0
            data = v.tobytes()
        bufs.append(("data", data))
        return base.EncodedColumn(codec="raw", meta={}, buffers=bufs)
    elif pa.types.is_fixed_size_binary(t):
        # record + enforce the width invariant (reference `w:n` format,
        # /root/reference/src/flatbuffer_utils.cpp:424-441)
        w = t.byte_width
        ab = arr.buffers()
        raw_data = ab[1]
        if raw_data is None or n == 0:
            data = b""
        else:
            v = np.frombuffer(raw_data, dtype=np.uint8, count=(arr.offset + n) * w)
            v = v[arr.offset * w :].reshape(n, w).copy()
            if arr.null_count:  # canonicalize null slots to 0 (determinism)
                valid = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
                v[~valid] = 0
            data = v.tobytes()
        if len(data) != n * w:
            raise ValueError(f"fixed_size_binary width invariant violated: "
                             f"{len(data)} bytes != {n} * {w}")
        bufs.append(("data", data))
        return base.EncodedColumn(codec="raw", meta={"w": w}, buffers=bufs)
    elif pa.types.is_decimal(t):
        filled = arr.fill_null(0) if arr.null_count else arr
        ab = filled.buffers()
        width = t.bit_width // 8
        data = ab[1].slice(0, n * width).to_pybytes() if ab[1] is not None else b""
        bufs.append(("data", data))
    elif pa.types.is_boolean(t):
        filled = arr.fill_null(False) if arr.null_count else arr
        data = np.packbits(
            filled.to_numpy(zero_copy_only=False).astype(bool), bitorder="little"
        ).tobytes()
        bufs.append(("data", data))
    else:
        # fixed-width primitives (ints, floats, timestamp, date)
        if arr.null_count:
            storage = arr.cast(_storage_int(t)) if _is_temporal(t) else arr
            filled = storage.fill_null(_zero_scalar(storage.type))
        else:
            filled = arr.cast(_storage_int(t)) if _is_temporal(t) else arr
        npv = filled.to_numpy(zero_copy_only=False)
        bufs.append(("data", np.ascontiguousarray(npv).tobytes()))
    return base.EncodedColumn(codec="raw", meta={}, buffers=bufs)


def _is_temporal(t: pa.DataType) -> bool:
    return (pa.types.is_timestamp(t) or pa.types.is_date(t)
            or pa.types.is_duration(t) or pa.types.is_time(t))


def _storage_int(t: pa.DataType) -> pa.DataType:
    if (pa.types.is_timestamp(t) or pa.types.is_duration(t)
            or pa.types.is_time64(t) or pa.types.is_date64(t)):
        return pa.int64()
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return pa.int32()
    return t


def _zero_scalar(t: pa.DataType):
    if pa.types.is_floating(t):
        return 0.0
    return 0


_NP_DTYPE = {
    "int8": np.int8, "int16": np.int16, "int32": np.int32, "int64": np.int64,
    "uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32, "uint64": np.uint64,
    "float": np.float32, "double": np.float64,
    "date32[day]": np.int32,
}


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    t = dtype
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        w = _offsets_width(t)
        odt = np.int64 if w == 8 else np.int32
        if "offsets" in buffers:  # legacy plain-offset blocks
            offsets = np.frombuffer(buffers["offsets"], dtype=odt)
        else:
            o_bufs = {k[2:]: v for k, v in buffers.items() if k.startswith("o_")}
            offs_arr = base.decode_column(
                "for_bitpack", meta["offsets_meta"], o_bufs, length + 1, pa.int64(), ctx
            )
            offsets = offs_arr.to_numpy(zero_copy_only=False).astype(odt)
        data = buffers.get("data", b"")
        null_count = 0 if valid is None else int(length - valid.sum())
        vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            t, length, [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)], null_count
        )
    if pa.types.is_interval(t):
        null_count = 0 if valid is None else int(length - valid.sum())
        vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            t, length, [vbuf, pa.py_buffer(buffers.get("data", b""))], null_count
        )
    if pa.types.is_fixed_size_binary(t):
        w = int(meta.get("w", t.byte_width))
        data = buffers.get("data", b"")
        if w != t.byte_width or len(data) != length * w:
            raise ValueError(
                f"fixed_size_binary width invariant violated on decode: stored w={w}, "
                f"type w={t.byte_width}, {len(data)} bytes for {length} rows"
            )
        null_count = 0 if valid is None else int(length - valid.sum())
        vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(t, length, [vbuf, pa.py_buffer(data)], null_count)
    if pa.types.is_decimal(t):
        null_count = 0 if valid is None else int(length - valid.sum())
        vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            t, length, [vbuf, pa.py_buffer(buffers.get("data", b""))], null_count
        )
    if pa.types.is_boolean(t):
        bits = np.unpackbits(
            np.frombuffer(buffers["data"], dtype=np.uint8), count=length, bitorder="little"
        ).astype(bool)
        return base.rebuild_with_validity(pa.array(bits, type=pa.bool_()), valid)
    if (pa.types.is_timestamp(t) or pa.types.is_duration(t)
            or pa.types.is_time64(t) or pa.types.is_date64(t)):
        v = np.frombuffer(buffers["data"], dtype=np.int64, count=length)
        return base.rebuild_with_validity(pa.array(v).cast(t), valid)
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        v = np.frombuffer(buffers["data"], dtype=np.int32, count=length)
        return base.rebuild_with_validity(pa.array(v).cast(t), valid)
    npdt = _NP_DTYPE.get(str(t))
    if npdt is None:
        raise ValueError(f"raw decode: unsupported {t}")
    v = np.frombuffer(buffers["data"], dtype=npdt, count=length)
    return base.rebuild_with_validity(pa.array(v, type=t), valid)


base.register("raw", encode, decode)
