"""Generalized table encode: any supported schema round-trips
bit-identical (embeddings with array<float>, documents, events)."""

from __future__ import annotations

import pytest

from sparrow_ipc_spark.operators.decode_job import decode_blocks
from sparrow_ipc_spark.operators.encode_job import encode_table, infer_fields, spark_schema_for
from sparrow_ipc_spark.operators.verify import column_fingerprints

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("table", ["embeddings", "documents", "events", "lineitem", "orders"])
def test_any_table_roundtrip(spark, table):
    df = spark.read.parquet(f"{SF}/{table}.parquet")
    fields = infer_fields(df)
    blocks_df, dict_rows, _ = encode_table(spark, df)
    dec = decode_blocks(spark, blocks_df, dict_rows, schema=spark_schema_for(fields))
    fs, fd = column_fingerprints(df), column_fingerprints(dec)
    assert fs == fd, {k: (fs[k], fd[k]) for k in fs if fs[k] != fd[k]}


def test_unsupported_type_rejected(spark):
    # YearMonthIntervalType is the one genuinely unsupported surface type:
    # Spark's own Arrow conversion rejects it, so encode must refuse it early
    import pyspark.sql.types as T

    from sparrow_ipc_spark.operators.encode_job import _logical_of_spark

    with pytest.raises(ValueError, match="unsupported column type"):
        _logical_of_spark(T.YearMonthIntervalType())


def test_map_nested_interval_roundtrip(spark):
    """Spark-surface containers: map metadata, array<struct> tool calls,
    array<array<float>>, day-time interval — the transcript-table shapes the
    reference decodes via its recursive kernels."""
    import datetime as dt

    rows = []
    for i in range(200):
        rows.append((
            i,
            {"model": f"m{i % 3}", "lang": "en" if i % 2 else "fr"} if i % 7 else None,
            [{"tool": f"t{i % 5}", "ok": bool(i % 2)}] * (i % 3),
            [[float(i), float(i + 1)], [float(i * 2)]] if i % 4 else None,
            dt.timedelta(seconds=i * 13, microseconds=i) if i % 5 else None,
        ))
    df = spark.createDataFrame(
        rows,
        "id long, meta map<string,string>, calls array<struct<tool:string, ok:boolean>>, "
        "mat array<array<float>>, dur interval day to second",
    )
    fields = infer_fields(df)
    blocks_df, dr, _ = encode_table(spark, df)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    src = {tuple(str(sorted(x.items()) if isinstance(x, dict) else x) for x in r) for r in df.collect()}
    out = {tuple(str(sorted(x.items()) if isinstance(x, dict) else x) for x in r) for r in dec.collect()}
    assert src == out


def test_random_spark_schema_roundtrip(spark):
    """Seeded random Spark schemas (nested array/map/struct over the full
    scalar set incl. decimals and intervals) through encode_table →
    decode_blocks — the Spark-surface companion of the pyarrow-level
    random-schema fuzzer (tests/test_containers_property.py)."""
    import datetime
    import decimal
    import random

    import pyspark.sql.types as T

    rnd = random.Random(17)
    SCALARS = [T.LongType(), T.IntegerType(), T.ShortType(), T.DoubleType(),
               T.FloatType(), T.BooleanType(), T.StringType(), T.BinaryType(),
               T.DateType(), T.TimestampType(), T.DecimalType(14, 3),
               T.DayTimeIntervalType()]

    def rand_type(depth=0):
        r = rnd.random()
        if depth >= 2 or r < 0.5:
            return rnd.choice(SCALARS)
        if r < 0.7:
            return T.ArrayType(rand_type(depth + 1))
        if r < 0.85:
            return T.MapType(T.StringType(), rand_type(depth + 1))
        return T.StructType([T.StructField("a", rand_type(depth + 1)),
                             T.StructField("b", rand_type(depth + 1))])

    def rand_val(t):
        if rnd.random() < 0.12:
            return None
        if isinstance(t, T.LongType):
            return rnd.randint(-2**62, 2**62)
        if isinstance(t, T.IntegerType):
            return rnd.randint(-2**31, 2**31 - 1)
        if isinstance(t, T.ShortType):
            return rnd.randint(-2**15, 2**15 - 1)
        if isinstance(t, (T.DoubleType, T.FloatType)):
            return rnd.uniform(-1e6, 1e6)
        if isinstance(t, T.BooleanType):
            return rnd.random() < 0.5
        if isinstance(t, T.StringType):
            return "".join(rnd.choice("abcdé ") for _ in range(rnd.randint(0, 12)))
        if isinstance(t, T.BinaryType):
            return bytes(rnd.getrandbits(8) for _ in range(rnd.randint(0, 10)))
        if isinstance(t, T.DateType):
            return datetime.date(1970, 1, 1) + datetime.timedelta(
                days=rnd.randint(-30000, 30000))
        if isinstance(t, T.TimestampType):
            return datetime.datetime(2020, 1, 1) + datetime.timedelta(
                seconds=rnd.randint(0, 10**8))
        if isinstance(t, T.DecimalType):
            return decimal.Decimal(rnd.randint(-10**11, 10**11)).scaleb(-3)
        if isinstance(t, T.DayTimeIntervalType):
            return datetime.timedelta(seconds=rnd.randint(0, 10**6))
        if isinstance(t, T.ArrayType):
            return [rand_val(t.elementType) for _ in range(rnd.randint(0, 3))]
        if isinstance(t, T.MapType):
            return {f"k{i}": rand_val(t.valueType) for i in range(rnd.randint(0, 3))}
        if isinstance(t, T.StructType):
            return tuple(rand_val(f.dataType) for f in t.fields)
        raise AssertionError(t)

    canon = lambda rows: sorted(
        tuple(str(sorted(x.items()) if isinstance(x, dict) else x) for x in r)
        for r in rows)
    for trial in range(6):
        schema = T.StructType([T.StructField("id", T.LongType(), False)] + [
            T.StructField(f"c{i}", rand_type()) for i in range(rnd.randint(1, 3))])
        rows = [tuple([i] + [rand_val(f.dataType) for f in schema.fields[1:]])
                for i in range(120)]
        df = spark.createDataFrame(rows, schema)
        fields = infer_fields(df)
        blocks_df, dr, _ = encode_table(spark, df)
        dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
        assert canon(df.collect()) == canon(dec.collect()), \
            f"trial {trial}: {schema.simpleString()}"


def test_decimal_inside_containers_roundtrip(spark):
    """Regression (round-3 fuzzer find): a parameterized scalar nested in a
    container — struct<amount: decimal128(18,3)> / map<string, decimal> —
    must survive the logical-type string round trip (split_top_level used
    to break on the comma inside 'decimal128(18, 3)')."""
    from decimal import Decimal

    rows = [
        (i,
         {"amount": Decimal(i * 7).scaleb(-3), "tag": f"t{i % 3}"},
         {"price": Decimal(i).scaleb(-2)} if i % 4 else None)
        for i in range(100)
    ]
    df = spark.createDataFrame(
        rows,
        "id long, rec struct<amount: decimal(18,3), tag: string>, "
        "m map<string, decimal(10,2)>",
    )
    fields = infer_fields(df)
    blocks_df, dr, _ = encode_table(spark, df)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    canon = lambda rows: sorted(
        tuple(str(sorted(x.items()) if isinstance(x, dict) else x) for x in r)
        for r in rows
    )
    assert canon(df.collect()) == canon(dec.collect())


def test_field_metadata_roundtrip(spark, tmp_path_factory):
    """Per-field custom key/value metadata survives encode→decode — the
    reference carries it end-to-end (src/metadata.cpp:7-23,
    flatbuffer_utils.cpp:481-499; golden fixture ``custom_metadata``,
    tests/test_de_serialization_with_files.cpp:33-68).  Checked through
    BOTH surfaces: write_encoded/decode_dir and the Data Source."""
    import pyspark.sql.types as T

    from sparrow_ipc_spark.operators.decode_job import decode_dir
    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.sources.datasource import SparrowIPCDataSource, read_encoded

    meta = {"doc": "user identifier", "provenance": "crawl-2025", "pii": True}
    schema = T.StructType([
        T.StructField("uid", T.LongType(), False, metadata=meta),
        T.StructField("name", T.StringType(), True, metadata={"doc": "display name"}),
    ])
    df = spark.createDataFrame([(i, f"u{i}") for i in range(50)], schema)
    out = str(tmp_path_factory.mktemp("meta") / "enc")
    write_encoded(spark, df, out, dict_cols=(), clustered=True)
    dec = decode_dir(spark, out)
    assert dec.schema["uid"].metadata == meta
    assert dec.schema["name"].metadata == {"doc": "display name"}
    assert not dec.schema["uid"].nullable
    assert sorted(r["uid"] for r in dec.collect()) == list(range(50))
    # data source surface
    spark.dataSource.register(SparrowIPCDataSource)
    out2 = str(tmp_path_factory.mktemp("meta") / "ds")
    df.write.format("sparrow_ipc").mode("overwrite").save(out2)
    back = read_encoded(spark, out2)
    assert back.schema["uid"].metadata == meta
    assert back.count() == 50


def test_checksum_detects_corruption(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.sources.transcripts import transcripts_df

    out = str(tmp_path_factory.mktemp("crc"))
    df = transcripts_df(spark, n_convs=10, seed=42)
    write_encoded(spark, df, out, n_parts=2)
    blocks = spark.read.parquet(f"{out}/blocks")
    # truncating the body guarantees a checksum mismatch
    tampered = blocks.withColumn("body", F.expr("substring(body, 1, length(body) - 1)"))
    dict_rows = [r.asDict() for r in spark.read.parquet(f"{out}/dictionaries").collect()]
    with pytest.raises(Exception, match="checksum|PythonException|corrupted"):
        decode_blocks(spark, tampered, dict_rows).count()


def test_decode_stream(spark, tmp_path_factory):
    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.sources.transcripts import transcripts_df
    from sparrow_ipc_spark.streaming.decode_stream import decode_stream

    out = str(tmp_path_factory.mktemp("dstream"))
    sink = str(tmp_path_factory.mktemp("dstream_sink"))
    ckpt = str(tmp_path_factory.mktemp("dstream_ckpt"))
    df = transcripts_df(spark, n_convs=10, seed=42).cache()
    write_encoded(spark, df, out, n_parts=2)
    stream = decode_stream(spark, out)
    q = (
        stream.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(sink).count() == df.count()


def test_generic_cluster_by_roundtrip(spark):
    """encode_table(cluster_by=...) routes an arbitrary table through the
    salted hash-partition path: one exchange, co-located keys, sorted
    partitions — and decodes bit-identical."""
    from sparrow_ipc_spark.operators.decode_job import decode_blocks
    from sparrow_ipc_spark.operators.encode_job import (
        encode_table, infer_fields, spark_schema_for,
    )
    from sparrow_ipc_spark.plans.audit import shuffle_exchanges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fields = infer_fields(docs)
    blocks_df, dr, _ = encode_table(spark, docs, cluster_by="lang",
                                    order_by="doc_id", n_parts=4)
    assert len(shuffle_exchanges(blocks_df)) == 1  # exactly the repartition
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    assert dec.count() == docs.count()
    assert docs.exceptAll(dec).count() == 0 and dec.exceptAll(docs).count() == 0
    # clustering pays: lang column RLE/dict-encodes into long runs
    meta = blocks_df.collect()
    lang_codecs = {c["codec"] for r in meta for c in r["columns"] if c["name"] == "lang"}
    assert lang_codecs <= {"rle", "dict_local", "dict"}, lang_codecs


def test_decimal_and_struct_roundtrip(spark):
    from decimal import Decimal

    rows = [
        (0, Decimal("123.45"), {"role": "user", "score": 1.5}),
        (1, None, None),
        (2, Decimal("-0.01"), {"role": "assistant", "score": None}),
        (3, Decimal("99999999.99"), {"role": "user", "score": 0.0}),
    ] * 20
    rows = [(i,) + r[1:] for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        rows, "id long, amount decimal(10,2), info struct<role:string, score:double>"
    )
    fields = infer_fields(df)
    blocks_df, dr, _ = encode_table(spark, df)
    dec = decode_blocks(spark, blocks_df, dr, schema=spark_schema_for(fields))
    src = {tuple(str(x) for x in r) for r in df.collect()}
    out = {tuple(str(x) for x in r) for r in dec.collect()}
    assert src == out


def test_empty_input_encode_decode(spark, tmp_path_factory):
    """0-row input: encode commits an empty-but-valid directory, resume
    no-ops, decode returns 0 rows — no crashes anywhere in the lifecycle."""
    from sparrow_ipc_spark.operators.encode_job import write_encoded
    from sparrow_ipc_spark.operators.decode_job import decode_dir
    from sparrow_ipc_spark.sources.transcripts import transcripts_df

    out = str(tmp_path_factory.mktemp("empty"))
    df = transcripts_df(spark, n_convs=5, seed=42).where("1 = 0")
    stats = write_encoded(spark, df, out, n_parts=2)
    assert stats["rows"] == 0 and stats["blocks"] == 0
    stats2 = write_encoded(spark, df, out, n_parts=2, resume=True)
    assert stats2["rows"] == 0
    assert decode_dir(spark, out).count() == 0
