"""Property fuzz for the vendored baseline-JPEG codec: arbitrary image
shapes/qualities/layouts round-trip with bounded error, and arbitrary byte
corruption of a valid stream never escapes as anything but a decoded
array, ValueError, or NotImplementedError (no raw struct/index/key
errors, no unbounded allocation — the decoder caps at 64M pixels)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sparrow_ipc_spark.functions import jpeg


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 40), w=st.integers(1, 40), rgb=st.booleans(),
    quality=st.integers(40, 98), sub=st.booleans(), ri=st.integers(0, 4),
    seed=st.integers(0, 2**16),
)
def test_roundtrip_any_shape(h, w, rgb, quality, sub, ri, seed):
    """Lossy round-trip sanity on smooth content: shape preserved exactly,
    error bounded far below the dynamic range."""
    yy, xx = np.mgrid[0:h, 0:w]
    g = np.clip(96 + ((yy * 5 + xx * 3 + seed) % 64), 0, 255).astype(np.uint8)
    img = g[..., None].repeat(3, -1) if rgb else g
    dec = jpeg.decode_jpeg(
        jpeg.encode_jpeg(img, quality=quality, subsample=sub,
                         restart_interval=ri))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(np.int64) - img.astype(np.int64)).mean() < 48


@settings(max_examples=120, deadline=None)
@given(
    pos_frac=st.floats(0, 1), val=st.integers(0, 255),
    seed=st.integers(0, 7),
)
def test_corruption_never_escapes(pos_frac, val, seed):
    """Overwrite one byte anywhere in a valid stream: decode must either
    produce a uint8 array or raise ValueError/NotImplementedError —
    corrupt metadata must not surface raw struct/index/key errors or
    attempt huge allocations (header dims are byte-level, so a flipped
    size byte is exactly this test's territory)."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = bytearray(jpeg.encode_jpeg(img, quality=85, restart_interval=2))
    pos = 2 + int(pos_frac * (len(payload) - 3))
    payload[pos] = val
    try:
        out = jpeg.decode_jpeg(bytes(payload))
        assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=60, deadline=None)
@given(cut=st.floats(0, 1), seed=st.integers(0, 7))
def test_truncation_never_escapes(cut, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(12, 20), dtype=np.uint8)
    payload = jpeg.encode_jpeg(img, quality=85)
    trunc = payload[: max(2, int(cut * len(payload)))]
    try:
        out = jpeg.decode_jpeg(trunc)
        assert isinstance(out, np.ndarray)
    except (ValueError, NotImplementedError):
        pass
