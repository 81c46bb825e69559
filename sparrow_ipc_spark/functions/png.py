"""Vendored minimal PNG codec — pure stdlib ``zlib`` + numpy, no external
media library (PIL is uninstallable in this sandbox: no network route).

Implements the public PNG specification (RFC 2083 / W3C PNG spec):
chunk framing, IHDR/IDAT/IEND, zlib inflate, and all five scanline
filters (None/Sub/Up/Average/Paeth) for non-interlaced 8-bit images in
grayscale (color type 0), RGB (2), and RGBA (6).  Enough to make the
multimodal ``image_features`` path a REAL decode end-to-end instead of a
stand-in, while staying inside the no-install environment contract.

Unfiltering: None/Up rows are whole-row vectorized and Sub is a per-lane
cumulative sum; Average/Paeth carry a left-pixel dependency that is
inherently sequential in x, so those rows run a Python-int recurrence
(~10 MB/s — fine for metadata-scale thumbnails; a production deployment
decoding photo-scale corpora would swap in PIL, which `_decode_image_real`
already prefers for non-PNG).  Encode (for fixtures and the resize sink)
emits filter-0 scanlines + one zlib stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIGNATURE


def _chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,), tag = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("png: truncated chunk")
        crc_bytes = payload[pos + 8 + length:pos + 12 + length]
        if len(crc_bytes) != 4:
            raise ValueError("png: truncated chunk CRC")
        expect = struct.unpack(">I", crc_bytes)[0]
        if zlib.crc32(tag + data) & 0xFFFFFFFF != expect:
            raise ValueError(f"png: bad CRC in {tag!r} chunk")
        yield tag, data
        pos += 12 + length
        if tag == b"IEND":
            return
    raise ValueError("png: missing IEND")


def _paeth_row(cur: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    # the left-pixel dependency makes this inherently sequential in x; the
    # recurrence runs over plain Python ints (≈10× faster than per-element
    # numpy scalar indexing — numpy scalars pay boxing per access)
    c_list = cur.tolist()
    p_list = prior.tolist()
    out = c_list[:]
    for i in range(min(bpp, len(c_list))):
        out[i] = (c_list[i] + p_list[i]) & 0xFF
    for i in range(bpp, len(c_list)):
        a = out[i - bpp]
        b = p_list[i]
        c = p_list[i - bpp]
        p = a + b - c
        pa = p - a if p >= a else a - p
        pb = p - b if p >= b else b - p
        pc = p - c if p >= c else c - p
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[i] = (c_list[i] + pred) & 0xFF
    return np.asarray(out, dtype=np.uint8)


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    # left-dependency recurrence: out[i] = cur[i] + out[i-bpp].  Per byte
    # lane (mod bpp) this is a plain cumulative sum mod 256.
    out = cur.copy()
    for lane in range(bpp):
        out[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.uint64) & 0xFF
    return out.astype(np.uint8)


def _avg_row(cur: np.ndarray, prior: np.ndarray, bpp: int) -> np.ndarray:
    # same left-dependency treatment as _paeth_row: Python-int recurrence
    c_list = cur.tolist()
    p_list = prior.tolist()
    out = c_list[:]
    for i in range(min(bpp, len(c_list))):
        out[i] = (c_list[i] + p_list[i] // 2) & 0xFF
    for i in range(bpp, len(c_list)):
        out[i] = (c_list[i] + (out[i - bpp] + p_list[i]) // 2) & 0xFF
    return np.asarray(out, dtype=np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """(h, w) uint8 for grayscale, (h, w, c) for RGB/RGBA."""
    if not is_png(payload):
        raise ValueError("png: bad signature")
    width = height = None
    color_type = bit_depth = None
    idat = bytearray()
    for tag, data in _chunks(payload):
        if tag == b"IHDR":
            width, height, bit_depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8 or color_type not in _CHANNELS:
                raise ValueError(
                    f"png: unsupported bit_depth={bit_depth} color_type={color_type} "
                    "(vendored decoder handles 8-bit gray/RGB/RGBA)")
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("png: unsupported compression/filter/interlace")
        elif tag == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("png: missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError(f"png: inflate size {len(raw)} != {height * (stride + 1)}")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        cur = rows[y, 1:]
        if f == 0:
            line = cur.copy()
        elif f == 1:
            line = _sub_row(cur, ch)
        elif f == 2:
            line = (cur.astype(np.int32) + prior).astype(np.uint8)
        elif f == 3:
            line = _avg_row(cur, prior, ch)
        elif f == 4:
            line = _paeth_row(cur, prior, ch)
        else:
            raise ValueError(f"png: bad filter {f} on row {y}")
        out[y] = line
        prior = line
    return out.reshape(height, width) if ch == 1 else out.reshape(height, width, ch)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Filter-0 PNG of an (h, w) or (h, w, 3|4) uint8 array."""
    if img.dtype != np.uint8:
        raise ValueError("png: encode expects uint8")
    if img.ndim == 2:
        color_type, ch = 0, 1
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] in (3, 4):
        color_type, ch = (2, 3) if img.shape[2] == 3 else (6, 4)
        h, w = img.shape[:2]
    else:
        raise ValueError(f"png: unsupported shape {img.shape}")
    body = img.reshape(h, w * ch)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), body], axis=1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan, level))
            + _chunk(b"IEND", b""))


def luma(img: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma for RGB/RGBA; identity for grayscale.  Truncated
    integer form L = (R*299 + G*587 + B*114) // 1000.  NOTE: PIL's
    ``convert("L")`` uses ``(R*19595 + G*38470 + B*7471) >> 16`` fixed
    point, which differs by ±1 on some pixels — callers needing
    cross-environment determinism must route PNG through THIS module (see
    multimodal._decode_image_real)."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
