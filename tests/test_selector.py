"""Auto-selector: picks sensible codecs, never inflates, deterministic."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base
from sparrow_ipc_spark.codecs.selector import select_and_encode

RNG = np.random.default_rng(123)


def final_size(choice) -> int:
    return sum(len(fb) for _, _, fb in choice.framed)


def decode_choice(choice, n, dtype, ctx=None):
    bufs = {}
    for (kind, _), (_, gcodec, framed) in zip(choice.encoded.buffers, choice.framed):
        bufs[kind] = base.decompress_buffer(framed, gcodec)
    return base.decode_column(choice.encoded.codec, choice.encoded.meta, bufs, n, dtype, ctx or {})


def test_low_cardinality_strings_get_dict():
    arr = pa.array(["user", "assistant", "system", "tool"] * 1000)
    ch = select_and_encode(arr, {"col_name": "role"})
    # the argmin may legitimately pick raw+zstd when packed offsets make it
    # smallest — the contract is extreme compression, not a codec name
    assert ch.encoded.codec in ("dict_local", "rle", "raw")
    assert ch.enc_bytes < ch.raw_bytes / 10
    assert decode_choice(ch, len(arr), pa.string()).to_pylist() == arr.to_pylist()


def test_sequential_ints_get_delta_bitpack():
    arr = pa.array(np.arange(10_000, dtype=np.int32))
    ch = select_and_encode(arr, {"col_name": "turn_idx"})
    assert ch.encoded.codec == "for_bitpack"
    assert ch.encoded.meta["delta"] is True
    assert ch.enc_bytes < 100  # all deltas are 1 → width 0
    assert decode_choice(ch, len(arr), pa.int32()).to_pylist() == arr.to_pylist()


def test_monotonic_timestamps_delta():
    v = 1735689600_000_000 + np.cumsum(RNG.integers(1_000_000, 300_000_000, 5000))
    arr = pa.array(v.astype(np.int64)).cast(pa.timestamp("us"))
    ch = select_and_encode(arr, {"col_name": "ts"})
    assert ch.encoded.codec == "for_bitpack" and ch.encoded.meta["delta"] is True
    assert ch.enc_bytes < 0.55 * ch.raw_bytes
    assert decode_choice(ch, len(arr), pa.timestamp("us")).to_pylist() == arr.to_pylist()


def test_incompressible_never_inflates():
    raw = [bytes(RNG.bytes(64)).hex() for _ in range(500)]
    arr = pa.array(raw)
    ch = select_and_encode(arr, {"col_name": "text"})
    # framing + headers only: ≤ raw size + 8B per buffer + symtab slack
    assert final_size(ch) <= ch.raw_bytes + 8 * 4 + 600
    assert decode_choice(ch, len(arr), pa.string()).to_pylist() == raw

    rand_ints = pa.array(RNG.integers(-(2**62), 2**62, 5000), type=pa.int64())
    ch2 = select_and_encode(rand_ints, {"col_name": "x"})
    assert final_size(ch2) <= ch2.raw_bytes + 8 * 3 + 64


def test_selection_deterministic():
    arr = pa.array([f"tok_{i % 50}" for i in range(3000)])
    a = select_and_encode(arr, {"col_name": "tool"})
    b = select_and_encode(arr, {"col_name": "tool"})
    assert a.encoded.codec == b.encoded.codec
    assert [fb for _, _, fb in a.framed] == [fb for _, _, fb in b.framed]


def test_global_dict_preferred_when_available():
    values = pa.array(["assistant", "system", "tool", "user"])
    ctx = {"col_name": "role", "global_dicts": {"role": {"dict_id": 42, "values": values}}}
    arr = pa.array(["user", "assistant"] * 2000)
    ch = select_and_encode(arr, ctx)
    # exact argmin: any of dict/rle/raw can win; must compress hard and decode exactly
    assert ch.encoded.codec in ("dict", "rle", "raw")
    assert ch.enc_bytes < ch.raw_bytes / 50
    out = decode_choice(ch, len(arr), pa.string(), {"dict_values": {42: values}})
    assert out.to_pylist() == arr.to_pylist()
