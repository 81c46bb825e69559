"""Vendored minimal baseline JPEG codec — pure stdlib + numpy, no external
media library (PIL is uninstallable in this sandbox: no network route).

Implements the public JPEG specification (ITU-T T.81 / ISO 10918-1),
baseline sequential DCT only: marker parsing (SOI/APPn/DQT/SOF0/DHT/
SOS/DRI/EOI), canonical Huffman entropy decode (spec F.2.2.3) with
byte-stuffing and restart markers, dequantization + inverse zigzag,
vectorized 8×8 IDCT over all blocks at once, chroma upsampling for any
sampling factors, and JFIF YCbCr→RGB.  The encoder (for deterministic
test fixtures — no sample JPEGs can be downloaded here) emits baseline
4:4:4 with the spec's Annex K quantization + Huffman tables.

Same scale posture as the PNG sibling (:mod:`.png`): the per-coefficient
Huffman loop is Python (~1-3 MB/s) — fine for metadata-scale thumbnails
flowing through ``mapInPandas``; a production deployment decoding
photo-scale corpora would swap in PIL/libjpeg-turbo, which
``multimodal._decode_image_real`` already prefers for formats this module
does not claim.  Decode is bit-deterministic across environments (pure
integer + float64 numpy), which the image_features oracle relies on.

Reference parity note: the reference repo has no media path; this module
exists for the training-data-pipeline brief (multimodal columns), not for
sparrow-ipc parity.
"""

from __future__ import annotations

import struct

import numpy as np

# inverse zigzag: natural (row-major) position of the k-th coefficient in
# zigzag transmission order (T.81 Figure A.6)
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

# Annex K.1 quantization tables (luminance, chrominance), natural order
_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS counts for lengths 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal DCT-II basis: pixels = A.T @ coeffs @ A  (T.81 A.3.3)
_A = np.array([[(np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
                * np.cos((2 * n + 1) * k * np.pi / 16)
                for n in range(8)] for k in range(8)])


def is_jpeg(payload: bytes) -> bool:
    return len(payload) > 3 and payload[:2] == b"\xff\xd8"


class _HuffTable:
    """Canonical Huffman decode tables (spec C.2 generation, F.2.2.3
    decode: mincode/maxcode/valptr per code length)."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = list(vals)
        code, k = 0, 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for length in range(1, 17):
            n = bits[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1
        # encode map: symbol -> (code, length)
        self.enc: dict[int, tuple[int, int]] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.enc[self.vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops refilling at any non-RST marker (EOI)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None or self.pos >= len(self.data):
            self.buf = (self.buf << 8) & 0xFFFFFFFF  # pad zeros past EOI
            self.n += 8
            return
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:
                self.marker = nxt  # a real marker terminates the segment
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.n += 8
                self.pos -= 1
                return
        self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, t: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if t.maxcode[length] >= code >= t.mincode[length] and \
                    t.maxcode[length] != -1:
                return t.vals[t.valptr[length] + code - t.mincode[length]]
        raise ValueError("invalid JPEG: Huffman code longer than 16 bits")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 F.2.1.3.1)."""
        self.n = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None
            return
        # marker not yet seen by _fill: scan it directly
        while self.pos < len(self.data) - 1:
            if self.data[self.pos] == 0xFF and \
                    0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("invalid JPEG: expected restart marker")


def _extend(v: int, s: int) -> int:
    """Sign-extend a magnitude-category value (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG → uint8 array, (h, w) for
    grayscale or (h, w, 3) RGB (JFIF YCbCr interpretation).  Raises
    ``ValueError`` on corrupt/truncated input and ``NotImplementedError``
    for progressive (SOF2) / arithmetic / 12-bit streams — never a raw
    ``struct.error``/``IndexError`` (fuzz-asserted)."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, KeyError, struct.error) as e:
        raise ValueError(f"invalid JPEG: truncated or corrupt ({e!r})") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    data = bytes(payload)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    dri = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        m = data[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:  # parameterless
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + seglen]
        if m == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                z = np.frombuffer(seg[o + 1:o + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = z
                qt[tq] = nat
                o += 65
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1:o + 17])
                n = sum(bits)
                vals = list(seg[o + 17:o + 17 + n])
                huff[(tc, th)] = _HuffTable(bits, vals)
                o += 17 + n
        elif m == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            if not (1 <= h and 1 <= w) or h * w > (1 << 26):
                raise ValueError(
                    "invalid JPEG: implausible dimensions (this vendored "
                    "decoder caps at 64M pixels — thumbnail-scale by design)")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                hs, vs = hv >> 4, hv & 0xF
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError("invalid JPEG: sampling factor out of 1..4")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{m:02X}); only baseline "
                "sequential DCT (SOF0) is vendored — use PIL for the rest")
        elif m == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append({"id": cs, "td": tt >> 4, "ta": tt & 0xF})
            pos += seglen
            break  # entropy-coded data follows
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("invalid JPEG: missing SOF0/SOS")

    comps = frame["comps"]
    if len(scan) != len(comps):
        # T.81 allows baseline files built from several per-component
        # scans; decoding just the first would leave the other planes
        # zeroed — refuse loudly instead of returning garbage pixels
        raise NotImplementedError(
            "multi-scan baseline JPEG (per-component non-interleaved "
            "scans) is not vendored — use PIL for these")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        c = by_id[s["id"]]
        c["td"], c["ta"] = s["td"], s["ta"]
        c["pred"] = 0

    def _read_block(c, blk) -> None:
        dc_t, ac_t = huff[(0, c["td"])], huff[(1, c["ta"])]
        s = rd.decode_huff(dc_t)
        if s > 15:
            # T.81 F.1.2.1: DC magnitude category is at most 15 (11 for
            # 8-bit baseline); a corrupt Huffman table can map to any
            # byte, and receive(255) would grow pred past int64
            raise ValueError("invalid JPEG: DC magnitude category > 15")
        diff = _extend(rd.receive(s), s)
        c["pred"] += diff
        blk[0] = c["pred"]
        k = 1
        while k < 64:
            rs = rd.decode_huff(ac_t)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:  # ZRL: sixteen zeros
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("invalid JPEG: AC index overflow")
            blk[k] = _extend(rd.receive(s), s)
            k += 1

    rd = _BitReader(data, pos)
    if len(scan) == 1:
        # T.81 A.2.2: a ONE-component scan is NON-interleaved — the MCU is
        # a single data unit and blocks raster over the component's own
        # grid.  With one frame component hmax==h and vmax==v, so the
        # component is full resolution: ceil(w/8) x ceil(h/8) blocks (a
        # grayscale file keeping 2x2 luma factors from a color source has
        # different geometry than the interleaved MCU walk would assume).
        c = by_id[scan[0]["id"]]
        bh_, bw_ = -(-frame["h"] // 8), -(-frame["w"] // 8)
        c["zz"] = np.zeros((bh_, bw_, 64), dtype=np.int64)
        c["grid"] = (bh_, bw_)
        mcu_count = 0
        for byy in range(bh_):
            for bxx in range(bw_):
                if dri and mcu_count and mcu_count % dri == 0:
                    rd.restart()
                    c["pred"] = 0
                _read_block(c, c["zz"][byy, bxx])
                mcu_count += 1
    else:
        order = [by_id[s["id"]] for s in scan]
        for c in order:
            c["zz"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                               dtype=np.int64)
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and mcu_count and mcu_count % dri == 0:
                    rd.restart()
                    for c in order:
                        c["pred"] = 0
                for c in order:
                    for v in range(c["v"]):
                        for hh in range(c["h"]):
                            _read_block(
                                c, c["zz"][my * c["v"] + v, mx * c["h"] + hh])
                mcu_count += 1

    planes = []
    for c in comps:
        zz = c["zz"].reshape(-1, 64)
        nat = np.zeros_like(zz)
        nat[:, _ZZ] = zz
        nat *= qt[c["tq"]][None, :]
        blocks = nat.reshape(-1, 8, 8).astype(np.float64)
        # vectorized IDCT over every block at once
        pix = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        rows, cols = c.get("grid", (mcuy * c["v"], mcux * c["h"]))
        plane = (pix.reshape(rows, cols, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(rows * 8, cols * 8))
        # upsample to full grid, crop to image size
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:frame["h"], :frame["w"]])
    if len(planes) == 1:
        return planes[0]
    if len(planes) != 3:
        raise NotImplementedError("only 1- or 3-component JPEGs")
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder: baseline 4:4:4 (or grayscale), Annex K tables — fixture-grade.


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-fill (spec F.1.2.3)

    def marker(self, m: int) -> None:
        """Byte-align, then emit a raw (unstuffed) marker."""
        self.flush()
        self.out += bytes([0xFF, m])


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scaling formula (quality 1..100)."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int64)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, nat: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in nat[_ZZ])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _box2(p: np.ndarray) -> np.ndarray:
    """2×2 box-average downsample (edge-padded to even dims first)."""
    hh, ww = p.shape
    pp = np.pad(p.astype(np.float64), ((0, hh % 2), (0, ww % 2)), mode="edge")
    m = (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
    return np.clip(np.round(m), 0, 255).astype(np.uint8)


def _emit_block(bw: _BitWriter, blk: np.ndarray, dc_t: _HuffTable,
                ac_t: _HuffTable, pred: int) -> int:
    """Entropy-code one quantized zigzag-order block; returns new DC pred."""
    dc = int(blk[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_t.enc[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nzi = np.nonzero(blk[1:])[0]
    last = int(nzi[-1]) + 1 if len(nzi) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_t.enc[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_t.enc[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_t.enc[0x00]
        bw.write(code, length)
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 85, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as a baseline
    sequential JPEG, Annex K tables scaled by ``quality``.
    ``subsample=True`` emits 4:2:0 (2×2 luma sampling, box-averaged
    chroma); ``restart_interval`` emits DRI + RSTn markers every that many
    MCUs.  Both exist so the decoder's upsampling and restart-resync paths
    have deterministic in-repo fixtures.  Deterministic: same input →
    same bytes everywhere."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)
    sub = bool(subsample) and not gray
    if gray:
        planes = [img]
    else:
        rf = img[..., 0].astype(np.float64)
        gf = img[..., 1].astype(np.float64)
        bf = img[..., 2].astype(np.float64)
        y = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [np.clip(np.round(p), 0, 255).astype(np.uint8)
                  for p in (y, cb, cr)]
        if sub:
            planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
    dc_l = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _HuffTable(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    nc = 1 if gray else 3
    # (h_i, v_i) sampling factors per component
    sampling = [(2, 2) if (sub and i == 0) else (1, 1) for i in range(nc)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i in range(nc):
        ch_, cv = sampling[i]
        sof += bytes([i + 1, (ch_ << 4) | cv, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    out += _dht_segment(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        out += _dht_segment(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # quantized zigzag-order block grids, one per component
    grids = []
    for i, p in enumerate(planes):
        ch_, cv = sampling[i]
        rows, cols = mcuy * cv * 8, mcux * ch_ * 8
        pp = np.pad(p.astype(np.float64) - 128.0,
                    ((0, rows - p.shape[0]), (0, cols - p.shape[1])),
                    mode="edge")
        blocks = (pp.reshape(rows // 8, 8, cols // 8, 8)
                  .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
        coeffs = np.einsum("ij,njk,kl->nil", _A, blocks, _A.T)
        q = ql if i == 0 else qc
        quant = np.round(coeffs.reshape(-1, 64) / q[None, :]).astype(np.int64)
        # natural → zigzag transmission order, indexed [block_row, block_col]
        grids.append(quant[:, _ZZ].reshape(rows // 8, cols // 8, 64))

    bw = _BitWriter()
    preds = [0] * nc
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0] * nc
            for i in range(nc):
                ch_, cv = sampling[i]
                dc_t = dc_l if i == 0 else dc_c
                ac_t = ac_l if i == 0 else ac_c
                for v in range(cv):
                    for hh in range(ch_):
                        blk = grids[i][my * cv + v, mx * ch_ + hh]
                        preds[i] = _emit_block(bw, blk, dc_t, ac_t, preds[i])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
