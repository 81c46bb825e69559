"""Property-based round trips for the container codecs: random shapes,
lengths, null patterns — any logical value the types admit must survive
the full selector→framing→JSON-meta→decode pipeline unchanged."""

from __future__ import annotations

import json

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sparrow_ipc_spark.codecs import base, selector


def _roundtrip(arr: pa.Array) -> None:
    choice = selector.select_and_encode(arr, {"col_name": "c"})
    enc = choice.encoded
    meta = json.loads(json.dumps(enc.meta))
    bufs = {}
    for (kind, _p), (_, gcodec, framed) in zip(enc.buffers, choice.framed):
        bufs[kind] = base.decompress_buffer(framed, gcodec)
    out = base.decode_column(enc.codec, meta, bufs, len(arr), arr.type, {})
    assert out.type == arr.type
    assert out.to_pylist() == arr.to_pylist()


short_text = st.text(max_size=8)
opt_int = st.one_of(st.none(), st.integers(-2**62, 2**62))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.lists(opt_int, max_size=6)), max_size=40))
def test_list_of_int_property(vals):
    _roundtrip(pa.array(vals, type=pa.list_(pa.int64())))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.dictionaries(short_text, opt_int, max_size=5)),
                max_size=30))
def test_map_property(vals):
    _roundtrip(pa.array(vals, type=pa.map_(pa.string(), pa.int64())))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.lists(st.one_of(st.none(), short_text), max_size=4)),
                max_size=30))
def test_list_of_string_property(vals):
    _roundtrip(pa.array(vals, type=pa.list_(pa.string())))


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.one_of(st.none(), st.lists(
        st.one_of(st.none(), st.fixed_dictionaries(
            {"a": opt_int, "b": st.one_of(st.none(), short_text)})),
        max_size=4)),
    max_size=30))
def test_list_of_struct_property(vals):
    t = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string())]))
    _roundtrip(pa.array(vals, type=t))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.floats(allow_nan=False, width=32), min_size=3, max_size=3),
                min_size=1, max_size=30))
def test_uniform_float_lists_property(vals):
    # uniform lengths: the fixed_list codec path
    _roundtrip(pa.array(vals, type=pa.list_(pa.float32())))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(st.none(), st.integers(-(10**18 - 1), 10**18 - 1)),
                max_size=50))
def test_decimal_narrow_property(unscaled):
    # dec_for: any decimal128(18,2) value must survive the narrow int64 path
    from decimal import Decimal

    vals = [None if v is None else Decimal(v).scaleb(-2) for v in unscaled]
    _roundtrip(pa.array(vals, type=pa.decimal128(18, 2)))
