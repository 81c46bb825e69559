"""Container-codec round trips: map, nested list, list<struct>,
fixed-size list, plus the new scalar types (duration/time/unsigned,
fixed-size binary with the width invariant) and large_string support.

Parity targets: recursive list kernel
/root/reference/include/sparrow_ipc/array_deserializer.hpp:102-229,
fixed-size list /root/reference/src/array_deserializer.cpp:293-387,
map :512-516, fixed-width `w:n` /root/reference/src/flatbuffer_utils.cpp:424-441.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest

from sparrow_ipc_spark.codecs import base, selector
from sparrow_ipc_spark.codecs.dictionary import dict_id_for


def full_roundtrip(arr: pa.Array, ctx: dict | None = None) -> str:
    """Round trip through the FULL pipeline: selector → framing (zstd/lz4)
    → JSON meta (as stored in block rows) → decompress → decode.
    Returns the chosen codec name."""
    ctx = ctx or {}
    choice = selector.select_and_encode(arr, {**ctx, "col_name": "c"})
    enc = choice.encoded
    meta = json.loads(json.dumps(enc.meta))  # block rows store meta as JSON
    bufs = {}
    for (kind, _payload), (_, gcodec, framed) in zip(enc.buffers, choice.framed):
        bufs[kind] = base.decompress_buffer(framed, gcodec)
    out = base.decode_column(enc.codec, meta, bufs, len(arr), arr.type, ctx)
    assert out.type == arr.type, (out.type, arr.type)
    assert out.to_pylist() == arr.to_pylist(), f"{enc.codec} value mismatch"
    assert out.null_count == arr.null_count
    return enc.codec


MAP_CASES = {
    "str_int": pa.array([{"a": 1, "b": 2}, None, {}, {"c": 3}],
                        type=pa.map_(pa.string(), pa.int64())),
    "str_str": pa.array(
        [{"model": "m1", "lang": "en"}, {"model": "m1"}, None, {"model": "m2", "lang": "fr"}] * 25,
        type=pa.map_(pa.string(), pa.string())),
    "empty": pa.array([], type=pa.map_(pa.string(), pa.string())),
    "all_empty_maps": pa.array([{}] * 10, type=pa.map_(pa.string(), pa.int32())),
}


@pytest.mark.parametrize("name", list(MAP_CASES))
def test_map_roundtrip(name):
    codec = full_roundtrip(MAP_CASES[name])
    if len(MAP_CASES[name]):
        assert codec == "list"


NESTED_CASES = {
    "list_of_struct": pa.array(
        [[{"name": "t1", "ok": True}], None, [], [{"name": "t2", "ok": None}, {"name": "t1", "ok": False}]] * 10,
        type=pa.list_(pa.struct([("name", pa.string()), ("ok", pa.bool_())]))),
    "list_of_list_float": pa.array(
        [[[1.0, 2.0], [3.0]], [], None, [[0.5]]] * 10,
        type=pa.list_(pa.list_(pa.float32()))),
    "large_list_int": pa.array([[1, 2, 3], None, [], [9]] * 10,
                               type=pa.large_list(pa.int64())),
    "list_of_map": pa.array(
        [[{"k": 1}], None, [{}, {"z": 2}]] * 5,
        type=pa.list_(pa.map_(pa.string(), pa.int64()))),
}


@pytest.mark.parametrize("name", list(NESTED_CASES))
def test_nested_list_roundtrip(name):
    full_roundtrip(NESTED_CASES[name])


def test_list_null_slot_spanning_values():
    # ADVICE repro: a null list slot whose offsets span child values — the
    # stored offsets and child data must stay consistent (values under the
    # null slot are compacted deterministically)
    offsets = pa.array([0, 2, 5, 7], type=pa.int32())
    values = pa.array([1, 2, 3, 4, 5, 6, 7], type=pa.int64())
    lst = pa.ListArray.from_arrays(offsets, values)
    # null out the middle slot while keeping its offsets span
    lst = pa.ListArray.from_buffers(
        pa.list_(pa.int64()), 3,
        [pa.py_buffer(np.packbits(np.array([1, 0, 1], bool), bitorder="little").tobytes()),
         pa.py_buffer(np.array([0, 2, 5, 7], np.int32).tobytes())],
        null_count=1, children=[values],
    )
    assert lst.to_pylist() == [[1, 2], None, [6, 7]]
    full_roundtrip(lst)


def test_fixed_size_list_roundtrip():
    vals = pa.array(np.arange(20, dtype=np.float32))
    fsl = pa.FixedSizeListArray.from_arrays(vals, 4)
    assert full_roundtrip(fsl) == "fixed_list"
    # with nulls
    t = pa.list_(pa.float32(), 2)
    fsl_n = pa.Array.from_buffers(
        t, 3,
        [pa.py_buffer(np.packbits(np.array([1, 0, 1], bool), bitorder="little").tobytes())],
        null_count=1,
        children=[pa.array([1.0, 2.0, 99.0, 98.0, 3.0, 4.0], type=pa.float32())],
    )
    assert fsl_n.to_pylist() == [[1.0, 2.0], None, [3.0, 4.0]]
    full_roundtrip(fsl_n)


def test_uniform_list_stored_fixed():
    """Fixed-dim embeddings as plain list<float> should drop the offsets
    buffer via the fixed_list codec when it wins the argmin."""
    rng = np.random.default_rng(7)
    emb = [list(map(float, rng.standard_normal(16).astype(np.float32))) for _ in range(200)]
    arr = pa.array(emb, type=pa.list_(pa.float32()))
    choice = selector.select_and_encode(arr, {"col_name": "emb"})
    assert choice.encoded.codec == "fixed_list"  # strictly fewer buffers must win
    full_roundtrip(arr)


SCALAR_CASES = {
    "duration_us": pa.array([1_000_000, None, 0, -5, 86_400_000_000] * 10,
                            type=pa.duration("us")),
    "time32_ms": pa.array([0, 1000, None, 86_399_999] * 10, type=pa.time32("ms")),
    "time64_us": pa.array([0, None, 86_399_999_999] * 10, type=pa.time64("us")),
    "uint64_extreme": pa.array([0, 2**64 - 1, 2**63, None, 1], type=pa.uint64()),
    "uint8": pa.array([0, 255, None, 7] * 10, type=pa.uint8()),
    "date64": pa.array([0, 86_400_000, None] * 5, type=pa.date64()),
    "month_day_nano": pa.array(
        [(1, 2, 3_000_000_000), None, (0, 0, 0), (-1, 15, 123)] * 10,
        type=pa.month_day_nano_interval()),
    "decimal256": pa.array(
        [None if i % 7 == 0 else __import__("decimal").Decimal(i * 10**30) / 100
         for i in range(40)],
        type=pa.decimal256(60, 2)),
}


@pytest.mark.parametrize("name", list(SCALAR_CASES))
def test_new_scalar_roundtrip(name):
    full_roundtrip(SCALAR_CASES[name])


DEC_NARROW_CASES = {
    # random-ish amounts with nulls and negatives (precision 10 → int64 path)
    "amounts": pa.array(
        [None if i % 11 == 0 else __import__("decimal").Decimal((-1) ** i * i * 137) / 100
         for i in range(300)],
        type=pa.decimal128(10, 2)),
    # monotonic accruals → delta mode inside dec_for
    "monotonic": pa.array(
        [__import__("decimal").Decimal(1_000_000 + i * 25) / 100 for i in range(300)],
        type=pa.decimal128(18, 2)),
    "all_null": pa.array([None] * 20, type=pa.decimal128(9, 0)),
    "empty": pa.array([], type=pa.decimal128(5, 1)),
    "extremes": pa.array(
        [__import__("decimal").Decimal(10**18 - 1), __import__("decimal").Decimal(-(10**18 - 1)),
         None, __import__("decimal").Decimal(0)],
        type=pa.decimal128(18, 0)),
}


@pytest.mark.parametrize("name", list(DEC_NARROW_CASES))
def test_decimal_narrow_roundtrip(name):
    """decimal128(p≤18) round-trips through dec_for (the decimal32/64 parity
    path, /root/reference/src/flatbuffer_utils.cpp:408-423) at under the
    16 B/row raw layout."""
    arr = DEC_NARROW_CASES[name]
    codec = full_roundtrip(arr)
    if len(arr) and arr.null_count < len(arr):
        choice = selector.select_and_encode(arr, {"col_name": "c"})
        raw_enc = base.encode_column("raw", arr, {})
        assert choice.encoded.payload_bytes <= raw_enc.payload_bytes
        if name in ("amounts", "monotonic", "extremes"):
            assert codec == "dec_for", codec


def test_decimal_wide_stays_raw():
    from decimal import Decimal

    arr = pa.array([Decimal(10**25) / 100, None, Decimal(-(10**24))],
                   type=pa.decimal128(30, 2))
    assert full_roundtrip(arr) == "raw"  # precision > 18: no narrow path


def test_fixed_size_binary_roundtrip_and_invariant():
    arr = pa.array([b"abcde", b"fghij", None, b"12345"] * 10, type=pa.binary(5))
    assert full_roundtrip(arr) == "raw"
    # width invariant is recorded and checked on decode (reference `w:n`)
    enc = base.encode_column("raw", arr, {})
    assert enc.meta["w"] == 5
    bufs = dict(enc.buffers)
    bufs["data"] = bufs["data"][:-5]  # truncate one slot
    with pytest.raises(ValueError, match="width invariant"):
        base.decode_column("raw", enc.meta, bufs, len(arr), arr.type, {})


LARGE_CASES = {
    "large_low_card": pa.array(["user", "assistant", "tool"] * 100, type=pa.large_string()),
    "large_text": pa.array(["the quick brown fox jumps over the lazy dog " * 20 + str(i)
                            for i in range(100)], type=pa.large_string()),
    "large_binary": pa.array([b"\x00\x01" * 40, None, b"xyz"] * 10, type=pa.large_binary()),
}


@pytest.mark.parametrize("name", list(LARGE_CASES))
def test_large_string_binary_roundtrip(name):
    """ADVICE repro: large_string crashed _raw_size / dict_local offsets."""
    full_roundtrip(LARGE_CASES[name])


def test_dict_width_stable_across_delta_growth():
    """ADVICE high-severity repro: blocks encoded against a 200-value global
    dictionary must decode correctly after the dictionary has grown past the
    256-value byte-width boundary via delta appends."""
    vals200 = pa.array([f"v{i:04d}" for i in range(200)])
    ctx_enc = {"global_dicts": {"c": {"dict_id": dict_id_for("c"), "values": vals200}},
               "col_name": "c"}
    arr = pa.array([f"v{i:04d}" for i in np.random.default_rng(3).integers(0, 200, 500)])
    enc = base.encode_column("dict", arr, ctx_enc)
    assert enc is not None and enc.meta["n_dict"] == 200
    # decode-time dictionary has grown to 300 values (width 2, encode width 1)
    vals300 = pa.array([f"v{i:04d}" for i in range(300)])
    ctx_dec = {"dict_values": {dict_id_for("c"): vals300}}
    meta = json.loads(json.dumps(enc.meta))
    out = base.decode_column("dict", meta, dict(enc.buffers), len(arr), arr.type, ctx_dec)
    assert out.to_pylist() == arr.to_pylist()


def test_streaming_delta_dict_crosses_width_boundary(spark, tmp_path_factory):
    """End-to-end: micro-batch 1 encodes with <256 dictionary values,
    micro-batch 2 pushes the dictionary past 256 — batch-1 blocks must still
    decode (encode-time index width from block meta, not merged dict size)."""
    from pyspark.sql import functions as F

    from sparrow_ipc_spark.operators.decode_job import decode_dir
    from sparrow_ipc_spark.streaming.encode_stream import StreamingEncoder

    out = str(tmp_path_factory.mktemp("width_boundary"))
    mk = lambda lo, hi: spark.range(lo, hi).select(
        F.concat(F.lit("conv"), (F.col("id") % 10).cast("string")).alias("conv_id"),
        (F.col("id") % 100).cast("int").alias("turn_idx"),
        F.concat(F.lit("role_"), F.col("id").cast("string")).alias("role"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("tool_a").alias("tool"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("ts"),
    )
    enc = StreamingEncoder(spark, out, n_parts=2)
    enc.process_batch(mk(0, 200), 0)    # 200 distinct roles → width 1
    enc.process_batch(mk(200, 400), 1)  # 400 distinct total → width 2
    dec = decode_dir(spark, out)
    src = mk(0, 400)
    assert dec.count() == 400
    assert (
        src.exceptAll(dec).count() == 0 and dec.exceptAll(src).count() == 0
    ), "streaming width-boundary decode mismatch"
