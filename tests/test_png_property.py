"""Property fuzz for the vendored PNG codec: arbitrary image shapes and
channel counts round-trip; arbitrary per-row filter choices (produced by
the independent scalar filterer) invert; random single-byte corruption is
always detected (every chunk is CRC-framed)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sparrow_ipc_spark.functions import png
from tests.test_png import _assemble, _ref_filter


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24), w=st.integers(1, 24),
    ch=st.sampled_from([1, 3, 4]), seed=st.integers(0, 2**16),
)
def test_roundtrip_any_shape(h, w, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w) if ch == 1 else (h, w, ch),
                       dtype=np.uint8)
    back = png.decode_png(png.encode_png(img))
    assert back.shape == img.shape and np.array_equal(back, img)


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 12), w=st.integers(1, 12),
    ch_ct=st.sampled_from([(1, 0), (3, 2), (4, 6)]),
    filters=st.lists(st.integers(0, 4), min_size=12, max_size=12),
    seed=st.integers(0, 2**16),
)
def test_any_filter_sequence_inverts(h, w, ch_ct, filters, seed):
    ch, color_type = ch_ct
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    out = bytearray()
    prior = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        one = _ref_filter(np.vstack([prior, img[y]]), ch, filters[y])
        out += one[1 + w * ch:]
        prior = img[y]
    payload = _assemble(w, h, color_type, bytes(out))
    back = png.decode_png(payload)
    want = img.reshape(h, w) if ch == 1 else img.reshape(h, w, ch)
    assert np.array_equal(back, want)


@settings(max_examples=60, deadline=None)
@given(pos_frac=st.floats(0, 1), bit=st.integers(0, 7), seed=st.integers(0, 99))
def test_single_bitflip_detected(pos_frac, bit, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(8, 8), dtype=np.uint8)
    payload = bytearray(png.encode_png(img))
    # flip one bit anywhere past the 8-byte signature
    pos = 8 + int(pos_frac * (len(payload) - 9))
    payload[pos] ^= 1 << bit
    try:
        back = png.decode_png(bytes(payload))
    except ValueError:
        return  # detected: the contract
    except Exception as e:  # zlib/struct errors escaping would be a bug
        pytest.fail(f"non-ValueError escaped: {type(e).__name__}: {e}")
    pytest.fail(f"corruption at byte {pos} bit {bit} decoded silently: {back.shape}")
