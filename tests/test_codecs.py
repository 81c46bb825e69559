"""Unit round-trip tests per codec kernel, including the adversarial
fixture families from FIXTURES.md F2 (mirroring the reference's golden
corpus categories, /root/reference/tests/test_de_serialization_with_files.cpp:33-78).
No Spark — pure numpy/pyarrow, fast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sparrow_ipc_spark.codecs import base

RNG = np.random.default_rng(42)


def roundtrip(codec: str, arr: pa.Array, ctx: dict | None = None) -> base.EncodedColumn:
    ctx = ctx or {}
    enc = base.encode_column(codec, arr, ctx)
    assert enc is not None, f"{codec} returned None for {arr.type}"
    bufs = dict(enc.buffers)
    out = base.decode_column(codec, enc.meta, bufs, len(arr), arr.type, ctx)
    assert out.type == arr.type
    assert out.to_pylist() == arr.to_pylist(), f"{codec} value mismatch"
    # bit-identical at the logical level: null positions + values equal
    assert out.null_count == arr.null_count
    return enc


# --- fixture arrays (F2) -------------------------------------------------

STRING_CASES = {
    "plain": pa.array(["hello", "world", "hello", "abc", ""]),
    "zerolength": pa.array([], type=pa.string()),
    "all_null": pa.array([None] * 17, type=pa.string()),
    "single_run": pa.array(["same"] * 100),
    "all_distinct": pa.array([f"value_{i:06d}" for i in range(500)]),
    "unicode_text": pa.array(["héllo wörld", "日本語テキスト", "🎉🎊 emoji", "مرحبا بالعالم", "עִברִית"] * 8),
    "nulls_and_empty": pa.array(["a", None, "", None, "bb", "", None]),
    "incompressible": pa.array([bytes(RNG.bytes(50)).hex() for _ in range(100)]),
    "long_text": pa.array(["the quick brown fox jumps over the lazy dog " * 30] * 20),
}

INT_CASES = {
    "sequential": pa.array(np.arange(1000, dtype=np.int32)),
    "zerolength": pa.array([], type=pa.int32()),
    "all_null": pa.array([None] * 9, type=pa.int32()),
    "single_run": pa.array([7] * 256, type=pa.int32()),
    "extreme_int32": pa.array([np.iinfo(np.int32).min, np.iinfo(np.int32).max, 0, -1], type=pa.int32()),
    "extreme_int64": pa.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max, 0, -1, 1], type=pa.int64()),
    "random64": pa.array(RNG.integers(-(2**62), 2**62, 300), type=pa.int64()),
    "negative_deltas": pa.array([100, 50, 75, 25, 99, 0, -50], type=pa.int64()),
    "with_nulls": pa.array([1, None, 3, 3, 3, None, 7], type=pa.int64()),
}

TS_CASES = {
    "monotonic": pa.array(
        (1735689600_000_000 + np.cumsum(RNG.integers(1_000_000, 300_000_000, 100))).astype(np.int64)
    ).cast(pa.timestamp("us")),
    "ts_edges": pa.array([0, -62135596800_000_000, 9214646400_000_000, 1, -1], type=pa.int64()).cast(
        pa.timestamp("us")
    ),
    "ts_nulls": pa.array([1735689600_000_000, None, 1735689601_000_000], type=pa.int64()).cast(
        pa.timestamp("us")
    ),
}


@pytest.mark.parametrize("name", list(STRING_CASES))
@pytest.mark.parametrize("codec", ["raw", "fsst", "dict_local", "rle"])
def test_string_roundtrip(codec, name):
    arr = STRING_CASES[name]
    if codec == "dict_local" and len(arr) == 0:
        pytest.skip("local dict needs rows")
    if codec == "rle" and len(arr) == 0:
        pytest.skip("rle needs rows")
    roundtrip(codec, arr)


@pytest.mark.parametrize("name", list(INT_CASES))
@pytest.mark.parametrize("codec", ["raw", "for_bitpack", "rle"])
def test_int_roundtrip(codec, name):
    arr = INT_CASES[name]
    if codec == "rle" and len(arr) == 0:
        pytest.skip("rle needs rows")
    roundtrip(codec, arr)


@pytest.mark.parametrize("name", list(INT_CASES))
def test_int_delta_roundtrip(name):
    arr = INT_CASES[name]
    roundtrip("for_bitpack", arr, {"delta": True})


@pytest.mark.parametrize("name", list(TS_CASES))
@pytest.mark.parametrize("codec", ["raw", "for_bitpack", "rle"])
def test_ts_roundtrip(codec, name):
    roundtrip(codec, TS_CASES[name])


def test_global_dict_roundtrip():
    values = pa.array(["assistant", "system", "tool", "user"])
    ctx_enc = {"col_name": "role", "global_dicts": {"role": {"dict_id": 99, "values": values}}}
    arr = pa.array(["user", "assistant", None, "tool", "user", "system"])
    enc = base.encode_column("dict", arr, ctx_enc)
    out = base.decode_column(
        "dict", enc.meta, dict(enc.buffers), len(arr), pa.string(), {"dict_values": {99: values}}
    )
    assert out.to_pylist() == arr.to_pylist()


def test_global_dict_missing_value_rejected():
    values = pa.array(["a", "b"])
    ctx = {"col_name": "role", "global_dicts": {"role": {"dict_id": 1, "values": values}}}
    arr = pa.array(["a", "zzz"])  # zzz not in dictionary
    assert base.encode_column("dict", arr, ctx) is None


def test_bitpack_widths():
    for width in [0, 1, 3, 7, 8, 13, 31, 33, 63, 64]:
        hi = 2**width if width < 64 else 2**64
        u = RNG.integers(0, hi, 200, dtype=np.uint64)
        assert np.array_equal(base.bitunpack(base.bitpack(u, width), 200, width), u)


def test_buffer_framing_never_inflates():
    incompressible = RNG.bytes(10_000)
    codec, framed = base.compress_buffer(incompressible)
    assert len(framed) <= len(incompressible) + 8
    assert base.decompress_buffer(framed, codec) == incompressible
    compressible = b"abc" * 10_000
    codec2, framed2 = base.compress_buffer(compressible)
    assert codec2 != "none" and len(framed2) < len(compressible) // 4
    assert base.decompress_buffer(framed2, codec2) == compressible


# --- hypothesis property tests: FoR/bitpack and RLE over arbitrary ints ---
from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.one_of(st.integers(-(2**63), 2**63 - 1), st.none()), min_size=0, max_size=300),
    st.booleans(),
)
def test_forbp_property(values, delta):
    arr = pa.array(values, type=pa.int64())
    roundtrip("for_bitpack", arr, {"delta": delta})


def test_forbp_patched_roundtrip():
    """Patched FoR: clumpy small deltas + rare huge jumps (the clustered-ts
    shape) pack at the narrow window width with an exact exception list."""
    from sparrow_ipc_spark.codecs import forbp

    rng = np.random.default_rng(9)
    v, t = [], 10**15
    for conv in range(40):
        t += int(rng.integers(10**11, 10**13))          # boundary jump
        t += 0
        d = rng.integers(1_000_000, 2_000_000, size=50)  # ~21-bit deltas
        v.append(t + np.cumsum(d)); t = int(v[-1][-1])
    arr = pa.array(np.concatenate(v), type=pa.int64())
    enc = roundtrip("for_bitpack", arr, {"delta": True})
    assert enc.meta.get("patched") is True
    assert 0 < enc.meta["n_exc"] <= 0.1 * len(arr)
    assert enc.meta["width"] < 64
    # with nulls in the middle (null slots canonicalized to 0 → they become
    # outliers themselves; logical values must still round-trip)
    vals = arr.to_pylist()
    vals[5] = vals[100] = None
    roundtrip("for_bitpack", pa.array(vals, type=pa.int64()), {"delta": True})


def test_dec_for_patched_roundtrip():
    """Patched FoR rides through dec_for for free: accruing decimal
    amounts with rare large corrections pack at the small-delta width."""
    from decimal import Decimal

    from sparrow_ipc_spark.codecs import decimalcodec

    rng = np.random.default_rng(13)
    v, t = [], 10**9
    for seg in range(50):
        t += int(rng.integers(-(10**12), 10**12))
        d = rng.integers(100, 10000, size=100)
        v.append(t + np.cumsum(d)); t = int(v[-1][-1])
    vals = [Decimal(int(x)).scaleb(-2) for x in np.concatenate(v)]
    arr = pa.array(vals, type=pa.decimal128(18, 2))
    enc = roundtrip("dec_for", arr, {"delta": True})
    assert enc.meta["fw"].get("patched") is True


def test_forbp_patched_negative_jumps():
    """Out-of-order conversation starts: negative deltas at boundaries are
    exceptions below the window (wrapping puts them above 2^width)."""
    rng = np.random.default_rng(11)
    v, t = [], 10**15
    for conv in range(30):
        t += int(rng.integers(-5 * 10**12, 5 * 10**12))  # signed jump
        d = rng.integers(1_000_000, 2_000_000, size=60)
        v.append(t + np.cumsum(d)); t = int(v[-1][-1])
    arr = pa.array(np.concatenate(v), type=pa.int64())
    enc = roundtrip("for_bitpack", arr, {"delta": True})
    assert enc.meta.get("patched") is True


@settings(max_examples=80, deadline=None)
@given(st.lists(st.one_of(
    st.integers(0, 1000),                      # window values
    st.integers(-(2**62), 2**62)),             # occasional wild outliers
    min_size=64, max_size=400))
def test_forbp_patched_property(values):
    """Any outlier mix round-trips exactly, patched or not."""
    for delta in (False, True):
        roundtrip("for_bitpack", pa.array(values, type=pa.int64()),
                  {"delta": delta})


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.integers(-1000, 1000), st.none()), min_size=1, max_size=300))
def test_rle_property(values):
    roundtrip("rle", pa.array(values, type=pa.int64()))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(st.text(max_size=30), st.none()), min_size=0, max_size=150))
def test_string_selector_property(values):
    """Whatever the selector picks must round-trip exactly."""
    from sparrow_ipc_spark.codecs.selector import select_and_encode

    arr = pa.array(values, type=pa.string())
    ch = select_and_encode(arr, {"col_name": "text"})
    bufs = {}
    for (kind, _), (_, gcodec, framed) in zip(ch.encoded.buffers, ch.framed):
        bufs[kind] = base.decompress_buffer(framed, gcodec)
    out = base.decode_column(ch.encoded.codec, ch.encoded.meta, bufs, len(arr), pa.string(), {})
    assert out.to_pylist() == arr.to_pylist()
