"""Frame-of-reference + bit-packing codec for integer-like columns,
with optional delta pre-transform for monotonic sequences (turn_idx, ts).

Not present in the reference (it only has LZ4/ZSTD general compression,
/root/reference/src/compression.cpp:127-154); this is one of the
north-star lightweight codecs.  Semantics follow the classic FoR scheme:
``u[i] = v[i] - min(v)`` packed at the minimal bit width; delta mode stores
``first`` and packs ``diff(v)`` instead.  The patched (exception-list)
variant follows the public PFOR design (Zukowski, Héman, Nes, Boncz:
"Super-Scalar RAM-CPU Cache Compression", ICDE 2006): values inside an
order-statistic window pack at the window's width, outliers are stored
exactly as (position, value) pairs.  All arithmetic is mod-2^64
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


# patched-FoR knobs: exceptions are the values outside an order-statistic
# window; several window candidates are costed and the byte-argmin wins
# (a fixed [1%,99%] window misses blocks with 2-10% outliers — e.g. one
# conversation-boundary jump every ~12-50 turns)
PFOR_MIN_N = 64
PFOR_MAX_EXC_FRAC = 0.25
PFOR_WINDOWS = ((0.01, 0.99), (0.05, 0.95), (0.10, 0.90))


def _pack_to(bufs: list, kind: str, u: np.ndarray, width: int) -> int:
    """Append ``u`` packed at ``width`` bits (sub-byte dense matrix ≤8,
    byte-aligned above); returns the byte-aligned stored width."""
    if width <= 8:
        if width:
            bufs.append((kind, base.bitpack(u, width)))
        return width
    nbytes = (width + 7) // 8
    bufs.append((kind, base.bytepack(u, nbytes)))
    return nbytes * 8


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
    m = len(e)
    ref = int(e.min())
    u = e.view(np.uint64) - np.uint64(ref & _MASK64)  # wrapping: exact mod 2^64
    width = base.bit_width(u)
    plain_bytes = m * ((width + 7) // 8) if width else 0

    # patched layout (PFoR): pack an order-statistic window at its own
    # (much narrower) width and store the outliers — e.g. conversation-
    # boundary timestamp jumps between small in-conversation deltas — as an
    # exact (position, value) exception list.  Window candidates are costed
    # exactly and the byte-argmin wins; exact order stats → pure function
    # of chunk content (deterministic across retries).
    # delta mode only: outliers-between-small-values is a delta phenomenon
    # (boundary jumps); absolute-value distributions with wide outlier
    # ranges are already served by raw+zstd, and the per-candidate sort is
    # not free at 65k rows
    if delta and m >= PFOR_MIN_N and width > 8:
        es = np.sort(e)
        pos_w = max(1, (base.bit_width(np.array([m - 1], dtype=np.uint64)) + 7) // 8)
        best = None  # (patched_bytes, lo, width_p, exc_mask, n_exc)
        for qlo, qhi in PFOR_WINDOWS:
            lo = int(es[int(qlo * (m - 1))])
            hi = int(es[int(qhi * (m - 1))])
            width_p = base.bit_width(
                np.array([np.uint64((hi - lo) & _MASK64)], dtype=np.uint64))
            if width_p >= width or width_p >= 64:
                continue
            u_p = e.view(np.uint64) - np.uint64(lo & _MASK64)
            exc_mask = u_p >= (np.uint64(1) << np.uint64(width_p)) if width_p \
                else u_p != 0
            n_exc = int(exc_mask.sum())
            if n_exc > PFOR_MAX_EXC_FRAC * m:
                continue
            # exact stored size: sub-byte widths bitpack at ceil(m*w/8)
            packed = (m * width_p + 7) // 8 if width_p <= 8 \
                else m * ((width_p + 7) // 8)
            pb = packed + n_exc * (pos_w + 8)
            if pb < plain_bytes and (best is None or pb < best[0]):
                best = (pb, lo, width_p, exc_mask, n_exc)
        if best is not None:
            _pb, lo, width_p, exc_mask, n_exc = best
            u_p = e.view(np.uint64) - np.uint64(lo & _MASK64)
            u_kept = np.where(exc_mask, np.uint64(0), u_p)
            stored_w = _pack_to(bufs, "packed", u_kept, width_p)
            pos = np.flatnonzero(exc_mask).astype(np.uint64)
            bufs.append(("exc_pos", base.bytepack(pos, pos_w)))
            bufs.append(("exc_val", base.bytepack(e[exc_mask].view(np.uint64), 8)))
            meta.update(ref=lo, width=stored_w,
                        pack="bits" if width_p <= 8 else "bytes",
                        patched=True, n_exc=n_exc, pos_w=pos_w)
            return base.EncodedColumn(codec="for_bitpack", meta=meta, buffers=bufs)

    # sub-byte bit-packing only where the dense bit matrix is cheap (≤8
    # bits); wider values use byte-aligned packing (memcpy-speed) and let
    # the zstd stage squeeze the ≤7 bits/value of high-zero slack
    stored_w = _pack_to(bufs, "packed", u, width)
    meta.update(ref=ref, width=stored_w, pack="bits" if width <= 8 else "bytes")
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
    if n != length:  # explicit: asserts vanish under PYTHONOPTIMIZE
        raise ValueError(f"for_bitpack block length {n} != field length {length}")
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
    if meta.get("patched"):
        n_exc = int(meta["n_exc"])
        pos = base.byteunpack(buffers.get("exc_pos", b""), n_exc, int(meta["pos_w"]))
        vals = base.byteunpack(buffers.get("exc_val", b""), n_exc, 8)
        e[pos.astype(np.int64)] = vals
    if delta:
        first = np.uint64(int(meta["first"]) & _MASK64)
        v = np.concatenate(([first], first + np.cumsum(e, dtype=np.uint64))).view(np.int64)
    else:
        v = e.view(np.int64)
    return _cast_back(v, dtype, valid)


base.register("for_bitpack", encode, decode)
