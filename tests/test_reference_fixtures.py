"""Round-trip the reference's OWN local test fixtures through this engine.

The reference ships two Arrow integration-format JSON fixtures
(/root/reference/tests/data/map_array_sorted.json, ordered_dictionary.json)
used by its flag-preservation tests
(/root/reference/tests/test_map_keys_sorted.cpp:28-117,
test_ordered_dictionary.cpp).  We parse the same JSON, build the same
arrays, push them through the full selector→framing→decode pipeline, and
assert logical bit-identity plus the flags the reference asserts
(map keysSorted preserved; dictionary values decode in order)."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from sparrow_ipc_spark.codecs import base, selector

DATA = "/root/reference/tests/data"


def _bitmap(validity: list[int]) -> pa.Buffer:
    return pa.py_buffer(np.packbits(np.array(validity, bool), bitorder="little").tobytes())


def _full_roundtrip(arr: pa.Array) -> pa.Array:
    choice = selector.select_and_encode(arr, {"col_name": "c"})
    enc = choice.encoded
    meta = json.loads(json.dumps(enc.meta))
    bufs = {}
    for (kind, _p), (_, gcodec, framed) in zip(enc.buffers, choice.framed):
        bufs[kind] = base.decompress_buffer(framed, gcodec)
    return base.decode_column(enc.codec, meta, bufs, len(arr), arr.type, {})


def test_map_keys_sorted_fixture_roundtrip():
    fx = json.load(open(f"{DATA}/map_array_sorted.json"))
    col = fx["batches"][0]["columns"][0]
    keys = col["children"][0]["children"][0]
    vals = col["children"][0]["children"][1]
    key_arr = pa.array(keys["DATA"], type=pa.string())
    val_arr = pa.array(
        [v if m else None for v, m in zip(vals["DATA"], vals["VALIDITY"])],
        type=pa.int32(),
    )
    mt = pa.map_(pa.string(), pa.int32(), keys_sorted=fx["schema"]["fields"][0]["type"]["keysSorted"])
    entries = pa.StructArray.from_arrays(
        [key_arr, val_arr],
        fields=[pa.field("key", pa.string(), nullable=False),
                pa.field("value", pa.int32())],
    )
    n = col["count"]
    offsets = np.array(col["OFFSET"], np.int32)
    null_count = col["VALIDITY"].count(0)
    arr = pa.Array.from_buffers(
        mt, n, [_bitmap(col["VALIDITY"]), pa.py_buffer(offsets.tobytes())],
        null_count, children=[entries],
    )
    assert arr.type.keys_sorted is True
    out = _full_roundtrip(arr)
    # the reference's assertion set: values identical AND flag preserved
    assert out.to_pylist() == arr.to_pylist()
    assert out.type.keys_sorted is True


def test_ordered_dictionary_fixture_roundtrip():
    fx = json.load(open(f"{DATA}/ordered_dictionary.json"))
    dict_vals = fx["dictionaries"][0]["data"]["columns"][0]["DATA"]
    batch = fx["batches"][0]["columns"][0]
    logical = [dict_vals[i] if m else None
               for i, m in zip(batch["DATA"], batch["VALIDITY"])]
    arr = pa.array(logical, type=pa.string())
    out = _full_roundtrip(arr)
    assert out.to_pylist() == logical
    # engine analog of isOrdered: global dictionary codes are assigned in
    # sorted value order and preserved through decode
    from sparrow_ipc_spark.codecs.dictionary import dict_id_for

    values = pa.array(sorted(set(dict_vals)), type=pa.string())
    ctx = {"global_dicts": {"c": {"dict_id": dict_id_for("c"), "values": values}},
           "col_name": "c"}
    enc = base.encode_column("dict", arr, ctx)
    dec = base.decode_column("dict", json.loads(json.dumps(enc.meta)),
                             dict(enc.buffers), len(arr), arr.type,
                             {"dict_values": {dict_id_for("c"): values}})
    assert dec.to_pylist() == logical
