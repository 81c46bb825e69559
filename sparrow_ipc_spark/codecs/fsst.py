"""FSST-style symbol-table compression for string columns.

A from-scratch, fully numpy-vectorized take on FSST (Boncz, Neumann &
Leis, "FSST: Fast Random Access String Compression", VLDB 2020 — public
paper): a per-chunk symbol table maps byte codes 0..254 to symbols; code
255 is the escape marker followed by one literal byte.  This implementation
restricts symbols to single bytes and digrams (length ≤ 2), which keeps
BOTH encode and decode branch-free vectorized numpy:

* greedy non-overlapping digram matching is computed with a run-parity
  trick (within each maximal run of consecutive matching positions, the
  greedy scan picks exactly the even offsets);
* escape disambiguation on decode uses the same trick on runs of 0xFF.

The codec operates on the column's concatenated UTF-8 data buffer; the
offsets buffer is delta+bit-packed separately (string lengths are small)
— so decode reconstructs the exact (validity, offsets, data) triple and
the string column round-trips bit-identical
(reference invariant: /root/reference/tests/test_de_serialization_with_files.cpp:226-264
raw-buffer byte compare).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base, forbp

ESCAPE = 255
MAX_CODES = 255  # codes 0..254; 255 reserved for escape
MAX_DIGRAMS = 200
MIN_DIGRAM_COUNT = 8
TRAIN_SAMPLE = 1 << 20


# ---------------------------------------------------------------------------
# Symbol table
# ---------------------------------------------------------------------------

def train(sample: bytes) -> bytes:
    """Build a serialized symbol table from a byte sample.

    Layout: [n_single: u8][n_digram: u8][single bytes…][digram pairs…].
    Codes 0..n_single-1 = single bytes (sorted by byte value);
    codes n_single..n_single+n_digram-1 = digrams (by count desc, pair asc).
    """
    a = np.frombuffer(sample[:TRAIN_SAMPLE], dtype=np.uint8)
    single_count = np.bincount(a, minlength=256)
    present = np.nonzero(single_count)[0]
    if len(a) >= 2:
        pair_vals = a[:-1].astype(np.int32) * 256 + a[1:]
        pair_count = np.bincount(pair_vals, minlength=65536)
    else:
        pair_count = np.zeros(65536, dtype=np.int64)

    # Greedy slot allocation by gain: a digram slot saves ~count bytes
    # (2 bytes → 1 code), a single-byte slot saves ~count bytes (escape
    # 2 bytes → 1 code).  Both gains are the occurrence count, so rank
    # all candidates together and take the top MAX_CODES.
    cand = np.nonzero(pair_count >= MIN_DIGRAM_COUNT)[0]
    order = np.lexsort((cand, -pair_count[cand]))  # count desc, pair value asc
    cand = cand[order][:MAX_DIGRAMS]
    gains = np.concatenate((single_count[present], pair_count[cand]))
    is_pair = np.concatenate((np.zeros(len(present), bool), np.ones(len(cand), bool)))
    ids = np.concatenate((present, cand))
    top = np.argsort(-gains, kind="stable")[:MAX_CODES]
    singles = np.sort(ids[top[~is_pair[top]]])
    digrams = ids[top[is_pair[top]]]
    # keep digram order deterministic: count desc, pair value asc
    dorder = np.lexsort((digrams, -pair_count[digrams])) if len(digrams) else []
    digrams = digrams[dorder] if len(digrams) else digrams
    out = bytearray([len(singles), len(digrams) & 0xFF])
    out += bytes(singles.astype(np.uint8).tolist())
    for d in digrams.tolist():
        out += bytes((d >> 8, d & 0xFF))
    return bytes(out)


def _tables(symtab: bytes):
    n_single, n_digram = symtab[0], symtab[1]
    singles = np.frombuffer(symtab, dtype=np.uint8, count=n_single, offset=2)
    pairs = np.frombuffer(symtab, dtype=np.uint8, count=2 * n_digram, offset=2 + n_single)
    b0, b1 = pairs[0::2], pairs[1::2]
    single_code = np.full(256, -1, dtype=np.int16)
    single_code[singles] = np.arange(n_single, dtype=np.int16)
    pair_code = np.full(65536, -1, dtype=np.int16)
    pair_code[b0.astype(np.int32) * 256 + b1] = np.arange(
        n_single, n_single + n_digram, dtype=np.int16
    )
    # decode tables indexed by code
    sym_len = np.ones(256, dtype=np.int64)
    sym_b0 = np.zeros(256, dtype=np.uint8)
    sym_b1 = np.zeros(256, dtype=np.uint8)
    sym_b0[:n_single] = singles
    sym_len[n_single : n_single + n_digram] = 2
    sym_b0[n_single : n_single + n_digram] = b0
    sym_b1[n_single : n_single + n_digram] = b1
    return single_code, pair_code, sym_len, sym_b0, sym_b1


def _greedy_select(match: np.ndarray) -> np.ndarray:
    """Greedy left-to-right non-overlapping selection from a match mask.

    Within each maximal run of consecutive True positions the greedy scan
    selects offsets 0, 2, 4, … — computed via run anchors, no Python loop.
    """
    starts = match.copy()
    starts[1:] &= ~match[:-1]
    idx32 = np.arange(len(match), dtype=np.int32)
    starts_idx = idx32[starts]
    if len(starts_idx) == 0:
        return np.zeros_like(match)
    run_id = np.cumsum(starts, dtype=np.int32)  # 1-based at in-run positions
    anchor = starts_idx[run_id - 1]  # garbage outside runs; masked below
    return match & (((idx32 - anchor) & np.int32(1)) == 0)


def compress(data: bytes, symtab: bytes) -> bytes:
    single_code, pair_code, _, _, _ = _tables(symtab)
    a = np.frombuffer(data, dtype=np.uint8)
    n = len(a)
    if n == 0:
        return b""
    if n >= 2:
        pcode_all = pair_code[a[:-1].astype(np.int32) * 256 + a[1:]]
        match = np.concatenate((pcode_all >= 0, [False]))
    else:
        pcode_all = np.empty(0, dtype=np.int16)
        match = np.zeros(1, dtype=bool)
    sel = _greedy_select(match)
    consumed = np.concatenate(([False], sel[:-1]))
    scode = single_code[a]
    free = ~sel & ~consumed
    is_single = free & (scode >= 0)
    is_esc = free & (scode < 0)
    out_len = sel.astype(np.int64) + is_single + 2 * is_esc
    off = np.concatenate(([0], np.cumsum(out_len)))
    out = np.empty(int(off[-1]), dtype=np.uint8)
    if sel.any():
        out[off[:-1][sel]] = pcode_all[sel[: len(pcode_all)]].astype(np.uint8)
    if is_single.any():
        out[off[:-1][is_single]] = scode[is_single].astype(np.uint8)
    if is_esc.any():
        e = off[:-1][is_esc]
        out[e] = ESCAPE
        out[e + 1] = a[is_esc]
    return out.tobytes()


def decompress(enc: bytes, symtab: bytes, orig_len: int) -> bytes:
    _, _, sym_len, sym_b0, sym_b1 = _tables(symtab)
    c = np.frombuffer(enc, dtype=np.uint8)
    n = len(c)
    if n == 0:
        return b""
    esc = _greedy_select(c == ESCAPE)
    lit = np.concatenate(([False], esc[:-1]))
    normal = ~esc & ~lit
    out_len = np.zeros(n, dtype=np.int64)
    out_len[lit] = 1
    out_len[normal] = sym_len[c[normal]]
    off = np.concatenate(([0], np.cumsum(out_len)))
    out = np.empty(int(off[-1]), dtype=np.uint8)
    if lit.any():
        out[off[:-1][lit]] = c[lit]
    if normal.any():
        out[off[:-1][normal]] = sym_b0[c[normal]]
        two = normal & (sym_len[c] == 2)
        if two.any():
            out[off[:-1][two] + 1] = sym_b1[c[two]]
    res = out.tobytes()
    if len(res) != orig_len:
        raise ValueError(f"fsst decode length {len(res)} != expected {orig_len}")
    return res


# ---------------------------------------------------------------------------
# Column codec (string): fsst data buffer + delta-bitpacked offsets
# ---------------------------------------------------------------------------

def applicable(t: pa.DataType) -> bool:
    return (pa.types.is_string(t) or pa.types.is_large_string(t)
            or pa.types.is_binary(t) or pa.types.is_large_binary(t))


MAX_PASSES = 2
_PROBE_FULL = 1 << 20  # full-accuracy zstd probe up to 1 MiB
_PROBE_SLICE = 32 * 1024


def _zstd_probe(payload: bytes) -> int:
    """Post-entropy size estimate for the pass-depth argmin: exact zstd
    size up to 1 MiB, else a stratified 4x32 KiB sample estimate (the
    selector's probe discipline) — the probe must not cost more than the
    compression it is pricing.  Pure function of content → deterministic
    pass selection across task retries."""
    n = len(payload)
    if n <= _PROBE_FULL:
        return len(base.compress_buffer(payload, candidates=("zstd",))[1])
    mv = memoryview(payload)
    sample = b"".join(
        bytes(mv[off:off + _PROBE_SLICE])
        for off in (0, n // 4, n // 2, max(0, n - _PROBE_SLICE))
    )
    comp = base._PA_CODECS["zstd"].compress(sample, asbytes=True)
    return int(len(comp) * (n / len(sample))) + 8


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type):
        return None
    n = len(arr)
    ab = arr.buffers()
    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    odt = np.int64 if large else np.int32
    if ab[1] is None or n == 0:
        offs = np.zeros(1, dtype=odt)
        data = b""
    else:
        offs = np.frombuffer(ab[1], dtype=odt, count=n + 1)
        data = ab[2].slice(0, int(offs[-1])).to_pybytes() if ab[2] is not None else b""
    if len(data) >= 2**31:
        # the vectorized matcher gathers with int32 positions; a >=2 GiB
        # buffer would silently wrap.  Arrow's large_string/large_binary
        # legitimately exceed 2 GiB even at the 65k-row block contract, so
        # bow out and let the selector fall through to raw/dict/rle+zstd
        # candidates instead of failing the whole encode job.
        return None
    # iterated digram passes (Re-Pair/BPE-style): pass k's digrams expand
    # to up to 2^k source bytes, so 2 passes ≈ 4-byte symbols.  The pass
    # depth is chosen by the size AFTER the general zstd stage — measured
    # on the transcript corpus, pre-zstd size ANTI-correlates with final
    # size (pass 2 shrinks the stream 18% but inflates the zstd output 5%:
    # substitution destroys redundancy zstd exploits better), so the old
    # keep-while-shrinking rule systematically over-deepened.  Lengths are
    # recorded per pass so decode can validate each inverse step exactly.
    all_tabs: list[bytes] = []
    all_lens: list[int] = [len(data)]
    enc = data
    best_framed = _zstd_probe(data)
    best_k = 0
    # only the (current, best) buffers stay live — never the whole pass
    # chain (a near-2 GiB chunk must not hold 3 concurrent copies)
    best_enc = data
    for _ in range(MAX_PASSES):
        st = train(enc)
        nxt = compress(enc, st)
        if len(nxt) >= len(enc) * 0.98:
            break
        all_tabs.append(st)
        enc = nxt
        all_lens.append(len(enc))
        framed = _zstd_probe(enc) + sum(len(t) for t in all_tabs)
        if framed < best_framed:
            best_framed, best_k, best_enc = framed, len(all_tabs), enc
    # best_k == 0 (no pass beats plain zstd on this chunk) still emits a
    # valid 0-pass encoding — decode is the identity on the data buffer —
    # and the selector's argmin will prefer the raw candidate
    symtabs = all_tabs[:best_k]
    lens = all_lens[:best_k + 1]
    enc = best_enc
    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    for i, st in enumerate(symtabs):
        bufs.append((f"symtab{i}", st))
    bufs.append(("data", enc))
    offs_enc = forbp.encode(pa.array(offs.astype(np.int64)), {"delta": True})
    for kind, b in offs_enc.buffers:
        bufs.append((f"o_{kind}", b))
    meta = {"lens": lens, "offsets_meta": offs_enc.meta}
    return base.EncodedColumn(codec="fsst", meta=meta, buffers=bufs)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    o_bufs = {k[2:]: v for k, v in buffers.items() if k.startswith("o_")}
    offs_arr = base.decode_column(
        "for_bitpack", meta["offsets_meta"], o_bufs, length + 1, pa.int64(), ctx
    )
    offs64 = offs_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    if "lens" in meta:
        lens = [int(x) for x in meta["lens"]]
        data = buffers.get("data", b"")
        # invert passes in reverse order; lens[i] = length after i passes
        for i in range(len(lens) - 2, -1, -1):
            data = decompress(data, buffers[f"symtab{i}"], lens[i])
    else:  # legacy single-pass blocks
        data = decompress(buffers.get("data", b""), buffers["symtab"], int(meta["orig_len"]))
    odt = (np.int64 if (pa.types.is_large_string(dtype)
                        or pa.types.is_large_binary(dtype)) else np.int32)
    offsets = offs64.astype(odt)
    null_count = 0 if valid is None else int(length - valid.sum())
    vbuf = None if valid is None else pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return pa.Array.from_buffers(
        dtype, length, [vbuf, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)], null_count
    )


base.register("fsst", encode, decode)
