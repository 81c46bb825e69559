"""Per-column codec auto-selection.

Generalizes the reference's post-hoc "is compression effective?" test
(/root/reference/src/compression.cpp:218-254: keep raw when compressed ≥
original) into an a-priori stats shortlist + exact argmin over encoded
sizes, with ``raw`` always in the candidate set so encoded output can
never inflate beyond framing headers.

Selection is a pure function of chunk content (required: Spark task
retries must re-produce identical blocks).  After the column codec runs,
every produced buffer independently passes through the general-purpose
stage (zstd/lz4/none, per-buffer granularity — the reference's
BodyCompressionMethod::BUFFER, Message.fbs:58-80), and the candidate's
final size is the sum of framed buffer sizes; each buffer is compressed
exactly once (the lesson of the reference's CompressionCache,
/root/reference/src/compression.cpp:33-125).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sparrow_ipc_spark.codecs import base, decimalcodec, forbp, listcodec, rle, structcodec

# gates (tuned on the synthetic transcript distributions; conservative —
# the exact argmin downstream corrects any shortlist mistake except a
# skipped winner, and raw+zstd is always present as the floor)
DICT_MAX_DISTINCT = 4096
DICT_MAX_RATIO = 0.25
RLE_MIN_MEAN_RUN = 2.5
FSST_MIN_AVG_LEN = 6.0
DELTA_MONOTONIC_FRAC = 0.99
DELTA_MOSTLY_FRAC = 0.5


@dataclass
class ColumnChoice:
    encoded: base.EncodedColumn
    framed: list[tuple[str, str, bytes]]  # (kind, general_codec, framed bytes)
    raw_bytes: int
    enc_bytes: int


def _data_bytes(arr: pa.Array) -> int:
    """UTF-8/binary payload bytes of a (large_)string/binary array."""
    n = len(arr)
    ab = arr.buffers()
    if not ab[1] or not n:
        return 0
    odt = np.int64 if (pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)) else np.int32
    return int(np.frombuffer(ab[1], odt, count=n + 1)[-1])


DISTINCT_SAMPLE = 8192


def _distinct_count(arr: pa.Array) -> int:
    """Distinct count for the dict/FSST gates, with a sample short-circuit.

    Exact ``count_distinct`` hashes every value — 43 ms on a 71k-row free-
    text column (27% of encode wall) just to learn "too many for dict".
    A prefix sample of ``DISTINCT_SAMPLE`` values is checked first: if the
    sample alone exceeds ``DICT_MAX_DISTINCT``, the full count can only be
    higher and every gate that needs it (dict ≤4096, fsst >64) is already
    decided.  Otherwise the exact count runs (cheap on low-cardinality
    columns).  Pure function of chunk content → deterministic selection
    across task retries."""
    nn = arr.drop_null()
    if len(nn) > DISTINCT_SAMPLE:
        sample_d = pc.count_distinct(nn.slice(0, DISTINCT_SAMPLE)).as_py()
        if sample_d > DICT_MAX_DISTINCT:
            return int(sample_d)  # lower bound; above every gate already
    return int(pc.count_distinct(nn).as_py())


def _raw_size(arr: pa.Array) -> int:
    t = arr.type
    n = len(arr)
    if pa.types.is_string(t) or pa.types.is_binary(t):
        return _data_bytes(arr) + 4 * (n + 1)
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        return _data_bytes(arr) + 8 * (n + 1)
    if pa.types.is_fixed_size_binary(t):
        return n * t.byte_width
    if pa.types.is_boolean(t):
        return (n + 7) // 8
    if pa.types.is_fixed_size_list(t):
        return _raw_size(arr.values) + (n + 7) // 8
    if pa.types.is_map(t):
        return 4 * (n + 1) + _raw_size(arr.keys) + _raw_size(arr.items)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        w = 8 if pa.types.is_large_list(t) else 4
        return w * (n + 1) + _raw_size(arr.values)
    if pa.types.is_struct(t):
        return sum(_raw_size(arr.field(i)) for i in range(t.num_fields)) + (n + 7) // 8
    return n * max(1, t.bit_width // 8)


def candidates_for(arr: pa.Array, ctx: dict) -> list[tuple[str, dict]]:
    """(codec, extra_ctx) shortlist from chunk stats."""
    t = arr.type
    n = len(arr)
    cands: list[tuple[str, dict]] = [("raw", {})]
    # container types first: raw passthrough cannot express nested layouts,
    # so they route to their codec even when empty
    if pa.types.is_fixed_size_list(t):
        return [("fixed_list", {})]
    if listcodec.list_like(t):
        lcands: list[tuple[str, dict]] = []
        if n and listcodec.fixed_applicable(arr):
            # first so equal-size ties keep the offset-free layout
            lcands.append(("fixed_list", {}))
        lcands.append(("list", {}))
        return lcands
    if structcodec.applicable(t):
        return [("struct", {})]
    if n == 0:
        return cands
    if (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t)):
        # binary columns share the string codecs (dict/rle/fsst all handle
        # binary layouts): repeated tool-call payloads etc. dict- and
        # run-compress exactly like low-cardinality strings
        distinct = _distinct_count(arr) if arr.null_count < n else 0
        mean_run = n / max(1, len(rle.run_bounds(arr)))
        if distinct <= DICT_MAX_DISTINCT and distinct <= max(256, n * DICT_MAX_RATIO):
            gd = (ctx.get("global_dicts") or {})
            cands.append(("dict" if ctx.get("col_name") in gd else "dict_local", {}))
        if mean_run >= RLE_MIN_MEAN_RUN:
            cands.append(("rle", {}))
        total_len = _data_bytes(arr)
        if n and total_len / n >= FSST_MIN_AVG_LEN and distinct > 64:
            cands.append(("fsst", {}))
    elif (pa.types.is_integer(t) or pa.types.is_timestamp(t) or pa.types.is_date(t)
          or pa.types.is_duration(t) or pa.types.is_time(t)):
        v = arr.fill_null(0) if arr.null_count else arr
        npv = forbp._int64_values(v)
        if n > 1:
            d = np.diff(npv)
            mono = float((d >= 0).mean())
            runs = int((d != 0).sum()) + 1
        else:
            mono, runs = 1.0, 1
        if n / runs >= RLE_MIN_MEAN_RUN:
            cands.append(("rle", {}))
        cands.append(("for_bitpack", {"delta": mono >= DELTA_MONOTONIC_FRAC}))
        if DELTA_MOSTLY_FRAC <= mono < DELTA_MONOTONIC_FRAC:
            # mostly-sorted (e.g. ts clustered by conversation): deltas are
            # small except rare boundary jumps — exactly the patched-FoR
            # shape, so offer the delta variant too and let argmin decide
            cands.append(("for_bitpack", {"delta": True}))
    elif pa.types.is_boolean(t):
        cands.append(("rle", {}))
    elif pa.types.is_floating(t):
        cands.append(("float_shuffle", {}))
    elif decimalcodec.applicable(t):
        lo = decimalcodec.unscaled_int64(arr)
        mono = float((np.diff(lo) >= 0).mean()) if n > 1 else 1.0
        cands.append(("dec_for", {"delta": mono >= DELTA_MONOTONIC_FRAC}))
        if DELTA_MOSTLY_FRAC <= mono < DELTA_MONOTONIC_FRAC:
            # accruing amounts with rare corrections: the patched-FoR shape
            cands.append(("dec_for", {"delta": True}))
    return cands


def select_unframed(arr: pa.Array, ctx: dict) -> base.EncodedColumn:
    """Codec choice by pre-compression payload size, for NESTED children
    (struct fields, list/map children).  The general zstd stage runs once at
    the top level, so nested framing would double-compress — the
    CompressionCache lesson (/root/reference/src/compression.cpp:33-125)."""
    best: base.EncodedColumn | None = None
    cands = candidates_for(arr, ctx)
    if any(c == "fsst" for c, _ in cands) and not _fsst_sample_gate(arr):
        cands = [(c, e) for c, e in cands if c != "fsst"]
    for codec, extra in cands:
        enc = base.encode_column(codec, arr, {**ctx, **extra})
        if enc is not None and (best is None or enc.payload_bytes < best.payload_bytes):
            best = enc
    assert best is not None
    return best


def frame_buffers(enc: base.EncodedColumn) -> list[tuple[str, str, bytes]]:
    """Apply the general-compression stage to each buffer exactly once."""
    out = []
    for kind, payload in enc.buffers:
        codec, framed = base.compress_buffer(payload)
        out.append((kind, codec, framed))
    return out


PROBE_LIMIT = 128 * 1024


def _probe_framed_size(payload: bytes) -> tuple[int, tuple[str, bytes] | None, str]:
    """(estimated framed size, exact (codec, framed) when cheap, codec hint).

    Buffers up to PROBE_LIMIT are compressed exactly (and the result reused
    for the winner).  Larger buffers are estimated from their first 128 KB —
    compressing every candidate's multi-MB buffers fully was ~46% of encode
    CPU while only the winner's bytes are ever kept; the sample also picks
    the general codec, so the winner is compressed exactly once.  Estimates
    are a pure function of chunk content, so codec selection stays
    deterministic across task retries."""
    n = len(payload)
    if n <= PROBE_LIMIT:
        codec, framed = base.compress_buffer(payload)
        return len(framed), (codec, framed), codec
    # stratified sample: four evenly-spaced slices, not the prefix — sorted
    # or clustered data compresses differently along the buffer, and a
    # prefix-only estimate was measured 1.5× optimistic on sorted conv_id
    # (flipping the argmin to a worse candidate)
    quarter = PROBE_LIMIT // 4
    mv = memoryview(payload)
    sample = b"".join(
        bytes(mv[off : off + quarter])
        for off in (0, n // 4, n // 2, max(0, n - quarter))
    )
    best, hint = n + 8, "none"
    for name in base.GENERAL_CODECS:
        comp = base._PA_CODECS[name].compress(sample, asbytes=True)
        est = int(len(comp) * (n / len(sample))) + 8
        if est < best:
            best, hint = est, name
    return best, None, hint


def _compress_as(payload: bytes, name: str) -> tuple[str, bytes]:
    """Compress with one chosen codec, keeping the never-inflate raw floor."""
    if name == "none" or len(payload) < base.MIN_COMPRESS_LEN:
        return "none", base.RAW_HEADER + payload
    comp = base._PA_CODECS[name].compress(payload, asbytes=True)
    if len(comp) + 8 >= len(payload) + 8:
        return "none", base.RAW_HEADER + payload
    import struct

    return name, struct.pack("<q", len(payload)) + comp


FSST_SAMPLE = 32 * 1024
FSST_GATE_RATIO = 0.95


def _fsst_sample_gate(arr: pa.Array) -> bool:
    """Cheap sampled trial: run FSST(+zstd) and zstd alone on the first
    32 KB of the data buffer; only admit the full-chunk FSST candidate if
    the sample says it wins.  Full-chunk FSST trials were 88% of encode
    CPU when zstd won anyway; at 128 KB the gate itself was ~20% of encode
    wall, and 32 KB is ample for digram statistics (still a pure function
    of chunk content)."""
    from sparrow_ipc_spark.codecs import fsst as fsst_mod

    bufs = arr.buffers()
    if bufs[2] is None:
        return False
    sample = bufs[2].slice(0, min(len(bufs[2]), FSST_SAMPLE)).to_pybytes()
    if len(sample) < 4096:
        return True  # tiny: full trial is cheap, let argmin decide
    # mirror the codec's multi-pass encode exactly — including its
    # post-zstd prefix-argmin pass selection — else the gate's ranking
    # diverges from what the full encode would actually produce
    enc, tab_bytes = sample, 0
    best = len(base.compress_buffer(sample, candidates=("zstd",))[1])
    for _ in range(fsst_mod.MAX_PASSES):
        st = fsst_mod.train(enc)
        nxt = fsst_mod.compress(enc, st)
        if len(nxt) >= len(enc) * 0.98:
            break
        enc, tab_bytes = nxt, tab_bytes + len(st)
        framed = len(base.compress_buffer(enc, candidates=("zstd",))[1]) + tab_bytes
        best = min(best, framed)
    _, raw_framed = base.compress_buffer(sample)
    return best < FSST_GATE_RATIO * len(raw_framed)


FINALIST_MARGIN = 1.10


def _frame_exact(enc: base.EncodedColumn,
                 exact: list[tuple[tuple[str, bytes] | None, str]]) -> list[tuple[str, str, bytes]]:
    framed: list[tuple[str, str, bytes]] = []
    for (kind, payload), (ex, hint) in zip(enc.buffers, exact):
        codec, fb = ex if ex is not None else _compress_as(payload, hint)
        framed.append((kind, codec, fb))
    return framed


def select_and_encode(arr: pa.Array, ctx: dict) -> ColumnChoice:
    """Encode the shortlist, rank candidates by estimated framed size, and
    resolve near-ties (within 10%) by exact framing — estimates alone can
    mis-rank candidates a few percent apart, and those are precisely the
    cases where the extra full compression pass is cheapest to justify."""
    cands = candidates_for(arr, ctx)
    if any(c == "fsst" for c, _ in cands) and not _fsst_sample_gate(arr):
        cands = [(c, e) for c, e in cands if c != "fsst"]
    scored: list[tuple[int, base.EncodedColumn, list]] = []
    for codec, extra in cands:
        enc = base.encode_column(codec, arr, {**ctx, **extra})
        if enc is None:
            continue
        size, exact = 0, []
        for _kind, payload in enc.buffers:
            est, ex, hint = _probe_framed_size(payload)
            size += est
            exact.append((ex, hint))
        scored.append((size, enc, exact))
    assert scored
    best_est = min(s for s, _, _ in scored)
    finalists = [t for t in scored if t[0] <= FINALIST_MARGIN * best_est]
    best_framed: list[tuple[str, str, bytes]] | None = None
    best_enc: base.EncodedColumn | None = None
    best_bytes = 0
    for _est, enc, exact in finalists:
        framed = _frame_exact(enc, exact)
        nb = sum(len(fb) for _, _, fb in framed)
        if best_framed is None or nb < best_bytes:
            best_framed, best_enc, best_bytes = framed, enc, nb
    return ColumnChoice(encoded=best_enc, framed=best_framed,
                        raw_bytes=_raw_size(arr), enc_bytes=best_bytes)
