"""Narrow decimal codec: decimal128 with precision ≤ 18 stored as packed
unscaled int64.

Reference parity: sparrow-ipc reads/writes decimal32/decimal64 layouts
(/root/reference/src/flatbuffer_utils.cpp:408-423, utils.cpp:41-105 —
4/8-byte unscaled ints instead of 16).  Spark's Arrow conversion only ever
produces decimal128, so instead of a fixed narrow layout the unscaled
values (|v| < 10^18 < 2^63 when precision ≤ 18) ride the existing
frame-of-reference + bit-pack codec — strictly ≤ the reference's fixed
4/8-byte encoding, and monotonic decimal columns (amounts accruing over
time) additionally delta-pack (including the patched exception-list mode,
so accruing amounts with rare large corrections pack at the small-delta
width — forbp.py PFoR).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base, forbp


def applicable(t: pa.DataType) -> bool:
    return pa.types.is_decimal128(t) and t.precision <= 18


def unscaled_int64(arr: pa.Array) -> np.ndarray:
    """Low 64 bits of each 128-bit unscaled value, null slots = 0.

    For precision ≤ 18 the value fits in int63, so the two's-complement
    low word viewed as int64 IS the value (high word is pure sign
    extension)."""
    n = len(arr)
    ab = arr.buffers()
    if ab[1] is None or n == 0:
        return np.zeros(n, dtype=np.int64)
    pairs = np.frombuffer(ab[1], dtype=np.int64, count=2 * (arr.offset + n)).reshape(-1, 2)
    lo = pairs[arr.offset : arr.offset + n, 0].copy()
    if arr.null_count:
        valid = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
        lo[~valid] = 0
    return lo


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type):
        return None
    n = len(arr)
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    lo = unscaled_int64(arr)
    inner = forbp.encode(pa.array(lo, type=pa.int64()),
                         {"delta": bool(ctx.get("delta", False))})
    for kind, b in inner.buffers:
        bufs.append((kind, b))  # int64 array has no validity buffer of its own
    return base.EncodedColumn(codec="dec_for", meta={"fw": inner.meta}, buffers=bufs)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    if not pa.types.is_decimal128(dtype):
        raise ValueError(f"dec_for decode: expected decimal128, got {dtype}")
    inner_bufs = {k: v for k, v in buffers.items() if k != "validity"}
    v = forbp.decode(meta["fw"], inner_bufs, length, pa.int64(), ctx)
    lo = v.to_numpy(zero_copy_only=False).astype(np.int64)
    pairs = np.empty((length, 2), dtype=np.int64)
    pairs[:, 0] = lo
    pairs[:, 1] = np.where(lo < 0, -1, 0)  # sign extension of the high word
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    null_count = 0 if valid is None else int(length - valid.sum())
    vbuf = (None if valid is None
            else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes()))
    return pa.Array.from_buffers(dtype, length, [vbuf, pa.py_buffer(pairs.tobytes())],
                                 null_count)


base.register("dec_for", encode, decode)
