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


# ---------------------------------------------------------------------------
# Random-SCHEMA fuzzer: hypothesis draws an arbitrary nested type (depth ≤ 3
# over the full supported scalar set) AND data for it — any (type, values)
# pair the engine claims to support must round-trip through full codec
# auto-selection.  This is the generalized form of the reference's
# generated_* golden-fixture corpus.
# ---------------------------------------------------------------------------

_SCALARS = [
    pa.int8(), pa.int16(), pa.int32(), pa.int64(),
    pa.uint32(), pa.uint64(), pa.float32(), pa.float64(), pa.bool_(),
    pa.string(), pa.large_string(), pa.binary(), pa.large_binary(),
    pa.timestamp("us"), pa.date32(), pa.date64(),
    pa.time32("ms"), pa.time64("us"), pa.duration("us"),
    pa.decimal128(18, 3), pa.decimal256(50, 5), pa.binary(7),
]

random_type = st.recursive(
    st.sampled_from(_SCALARS),
    lambda inner: st.one_of(
        inner.map(pa.list_),
        inner.map(pa.large_list),
        inner.map(lambda v: pa.list_(v, 3)),  # fixed-size list
        inner.map(lambda v: pa.map_(pa.string(), v)),
        st.tuples(inner, inner).map(
            lambda kv: pa.struct([("x", kv[0]), ("y", kv[1])])
        ),
    ),
    max_leaves=3,
)


def _values_for(t: pa.DataType) -> st.SearchStrategy:
    import datetime

    from decimal import Decimal

    if pa.types.is_boolean(t):
        base = st.booleans()
    elif pa.types.is_unsigned_integer(t):
        base = st.integers(0, 2 ** t.bit_width - 1)
    elif pa.types.is_time(t):
        res = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[t.unit]
        base = st.times().map(
            lambda tm: tm.replace(microsecond=(tm.microsecond // res) * res))
    elif pa.types.is_duration(t):
        base = st.integers(-2 ** 45, 2 ** 45).map(
            lambda us: datetime.timedelta(microseconds=us))
    elif pa.types.is_integer(t):
        base = st.integers(-(2 ** (t.bit_width - 1)), 2 ** (t.bit_width - 1) - 1)
    elif pa.types.is_floating(t):
        base = st.floats(allow_nan=False,
                         width=32 if pa.types.is_float32(t) else 64)
    elif pa.types.is_decimal(t):
        base = st.integers(-(10 ** t.precision - 1), 10 ** t.precision - 1).map(
            lambda v: Decimal(v).scaleb(-t.scale))
    elif pa.types.is_timestamp(t):
        base = st.integers(-2 ** 45, 2 ** 45).map(
            lambda us: datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=us))
    elif pa.types.is_date(t):
        base = st.integers(-100_000, 100_000).map(
            lambda d: datetime.date(1970, 1, 1) + datetime.timedelta(days=d))
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        base = st.text(max_size=10)
    elif pa.types.is_fixed_size_binary(t):
        base = st.binary(min_size=t.byte_width, max_size=t.byte_width)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        base = st.binary(max_size=10)
    elif pa.types.is_fixed_size_list(t):
        base = st.lists(_values_for(t.value_type),
                        min_size=t.list_size, max_size=t.list_size)
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        base = st.lists(_values_for(t.value_type), max_size=3)
    elif pa.types.is_map(t):
        base = st.dictionaries(st.text(max_size=6), _values_for(t.item_type),
                               max_size=3)
    elif pa.types.is_struct(t):
        base = st.fixed_dictionaries({f.name: _values_for(f.type) for f in t})
    else:  # pragma: no cover
        raise AssertionError(f"no strategy for {t}")
    return st.one_of(st.none(), base)


def _build_array(vals, t):
    """pa.array, skipping draws pyarrow itself refuses to convert (e.g.
    some wide Decimal256 values with trailing-zero coefficients trip a
    pyarrow inference quirk before our code ever runs)."""
    from hypothesis import assume

    try:
        return pa.array(vals, type=t)
    except pa.lib.ArrowInvalid:
        assume(False)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_random_schema_roundtrip(data):
    t = data.draw(random_type)
    vals = data.draw(st.lists(_values_for(t), max_size=25))
    _roundtrip(_build_array(vals, t))


@settings(max_examples=100, deadline=None)
@given(random_type)
def test_logical_type_string_identity(t):
    """dtype_from_logical(logical_str(t)) == t for every supported type —
    the parse the round-3 nested-decimal bug lived in."""
    assert base.dtype_from_logical(base.logical_str(t)) == t


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_random_schema_block_roundtrip(data):
    """Same fuzz one layer up: full block assembly (zone stats, buffer
    framing + general compression, CRC, meta_json) over a multi-column
    batch of random nested types."""
    from sparrow_ipc_spark.operators import blocks

    n_cols = data.draw(st.integers(1, 3))
    n_rows = data.draw(st.integers(0, 20))
    arrays, fields = [], []
    for ci in range(n_cols):
        t = data.draw(random_type)
        vals = [data.draw(_values_for(t)) for _ in range(n_rows)]
        arrays.append(_build_array(vals, t))
        fields.append((f"c{ci}", base.logical_str(t)))
    batch = pa.record_batch(arrays, names=[n for n, _ in fields])
    row = blocks.encode_batch_arrow(batch, fields, {"global_dicts": {}}, 0, 0)
    row["body"] = memoryview(row["body"])
    tbl = blocks.decode_block(row, {"dict_values": {}})
    for (name, _), arr in zip(fields, arrays):
        assert tbl.column(name).combine_chunks().to_pylist() == arr.to_pylist()
