"""Synthetic equivalents of the reference's arrow-testing golden-fixture
families that the sandbox cannot fetch (the corpus is CMake-downloaded,
/root/reference/tests/CMakeLists.txt:37; consumed by
tests/test_de_serialization_with_files.cpp:26-641):

* ``nested_dictionary``  — low-cardinality strings inside lists (children
  get dictionary/other codecs via auto-selection, recursively);
* ``map_non_canonical``  — maps with unsorted keys and duplicate-free but
  arbitrary ordering, plus null/empty maps;
* ``recursive_nested``   — list<struct<list<...>>> three levels deep;
* ``nested_large_offsets`` — large_list / large_string (int64 offsets), at
  the codec layer (Spark has no large-offset surface type);
* ``duplicate_fieldnames`` — designed error: block columns are keyed by
  name, so encode refuses duplicate names instead of silently corrupting.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from sparrow_ipc_spark.codecs import base, selector
from sparrow_ipc_spark.operators.decode_job import decode_blocks
from sparrow_ipc_spark.operators.encode_job import (
    encode_table,
    infer_fields,
    spark_schema_for,
)


def _spark_family(name: str, spark):
    if name == "nested_dictionary":
        rows = [
            (i, [f"tag{i % 4}", f"tag{(i + 1) % 4}"] * (i % 3) or None)
            for i in range(300)
        ]
        return spark.createDataFrame(rows, "id long, tags array<string>")
    if name == "map_non_canonical":
        rows = []
        for i in range(300):
            if i % 11 == 0:
                m = None
            elif i % 7 == 0:
                m = {}
            else:  # insertion order deliberately unsorted
                m = {"zulu": str(i), "alpha": None if i % 5 else "x", "mike": f"v{i % 3}"}
            rows.append((i, m))
        return spark.createDataFrame(rows, "id long, m map<string,string>")
    if name == "recursive_nested":
        rows = [
            (
                i,
                [
                    {"xs": [float(i), float(i) / 3] * (i % 2 + 1),
                     "label": f"l{i % 5}"}
                ] * (i % 3) or None,
            )
            for i in range(300)
        ]
        return spark.createDataFrame(
            rows, "id long, rec array<struct<xs: array<double>, label: string>>"
        )
    raise AssertionError(name)


@pytest.mark.parametrize(
    "family", ["nested_dictionary", "map_non_canonical", "recursive_nested"]
)
def test_spark_fixture_family_roundtrip(spark, family):
    df = _spark_family(family, spark)
    fields = infer_fields(df)
    blocks_df, dr, _ = encode_table(spark, df)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    canon = lambda rows: sorted(
        tuple(str(sorted(x.items()) if isinstance(x, dict) else x) for x in r)
        for r in rows
    )
    assert canon(df.collect()) == canon(dec.collect())


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([["a" * 40, None], None, [], ["b"]] * 50,
                 type=pa.large_list(pa.large_string())),
        pa.array([[1, 2, 3], None, [], [4]] * 50, type=pa.large_list(pa.int64())),
        pa.array(["x" * 100, None, "", "y"] * 50, type=pa.large_string()),
        pa.array([b"\x00" * 33, None, b"", b"z"] * 50, type=pa.large_binary()),
    ],
    ids=["large_list_large_string", "large_list_int64", "large_string", "large_binary"],
)
def test_nested_large_offsets_codec_roundtrip(arr):
    """int64-offset layouts round-trip through the codec layer with full
    auto-selection (the nested_large_offsets family)."""
    ctx = {"col_name": "c", "global_dicts": {}}
    choice = selector.select_and_encode(arr, ctx)
    enc = choice.encoded
    buffers = {k: v for k, v in enc.buffers}
    out = base.decode_column(enc.codec, enc.meta, buffers, len(arr), arr.type, ctx)
    assert out.equals(arr), (enc.codec, out.type)


def test_struct_delimiter_fieldnames_designed_error(spark):
    """Field names containing the logical-type grammar's own delimiters
    must refuse loudly at encode (misparse would corrupt sibling fields)."""
    import pyspark.sql.types as T

    for bad in ("a: b", "x,y", "w<z", "v>u"):
        schema = T.StructType([T.StructField(
            "s", T.StructType([T.StructField(bad, T.LongType())]))])
        df = spark.createDataFrame([((1,),)], schema)
        with pytest.raises(ValueError, match="not encodable"):
            infer_fields(df)
    with pytest.raises(ValueError, match="empty struct"):
        base.logical_str(pa.struct([]))


def test_struct_null_slot_canonicalization():
    """Logically equal structs with different junk values under null slots
    must encode to IDENTICAL bytes (pure function of logical content —
    Spark task retries / body_crc32 comparisons)."""
    from sparrow_ipc_spark.codecs import structcodec

    t = pa.struct([("a", pa.int64())])
    a1 = pa.StructArray.from_arrays(
        [pa.array([1, 999, 3])], ["a"],
        mask=pa.array([False, True, False]))
    a2 = pa.StructArray.from_arrays(
        [pa.array([1, -5, 3])], ["a"],
        mask=pa.array([False, True, False]))
    assert a1.equals(a2)  # logically equal (slot 1 is null)
    e1 = structcodec.encode(a1.cast(t), {})
    e2 = structcodec.encode(a2.cast(t), {})
    assert [b for _, b in e1.buffers] == [b for _, b in e2.buffers]


def test_binary_columns_get_string_codecs():
    """Low-cardinality / run-heavy binary columns must be offered
    dict/rle (not fall straight to raw) and round-trip."""
    import json

    payload = [b"tool-call-payload-A", b"tool-call-payload-B"]
    arr = pa.array([payload[i % 2] for i in range(64) for _ in range(8)],
                   type=pa.binary())
    choice = selector.select_and_encode(arr, {"col_name": "payload"})
    assert choice.encoded.codec in ("dict_local", "rle"), choice.encoded.codec
    enc = choice.encoded
    bufs = {k: base.decompress_buffer(f, gc)
            for (k, _p), (_, gc, f) in zip(enc.buffers, choice.framed)}
    out = base.decode_column(enc.codec, json.loads(json.dumps(enc.meta)),
                             bufs, len(arr), arr.type, {})
    assert out.to_pylist() == arr.to_pylist()


def test_duplicate_fieldnames_designed_error(spark):
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("dup", T.StringType()),
        T.StructField("dup", T.LongType()),
    ])
    df = spark.createDataFrame([(1, "x", 2)], schema)
    with pytest.raises(ValueError, match="duplicate field names"):
        infer_fields(df)
    with pytest.raises(ValueError, match="duplicate field names"):
        encode_table(spark, df)
