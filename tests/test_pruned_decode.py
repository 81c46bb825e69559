"""Zone-map block pruning + column-pruned decode (the IPC file-footer
random-access analog, /root/reference/src/deserialize.cpp:544-591)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparrow_ipc_spark.operators.decode_job import decode_blocks, decode_dir, prune_blocks
from sparrow_ipc_spark.operators.encode_job import write_encoded
from sparrow_ipc_spark.sources.transcripts import transcripts_df


@pytest.fixture(scope="module")
def encoded(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("enc_prune"))
    df = transcripts_df(spark, n_convs=50, seed=42).cache()
    write_encoded(spark, df, out, n_parts=8)
    return df, out


def test_zone_maps_present(spark, encoded):
    _, out = encoded
    blocks = spark.read.parquet(f"{out}/blocks")
    r = blocks.select("conv_min", "conv_max", "ts_min_us", "ts_max_us").first()
    assert r["conv_min"] <= r["conv_max"]
    assert r["ts_min_us"] <= r["ts_max_us"]


def test_single_conversation_decode_prunes(spark, encoded):
    df, out = encoded
    target = df.select("conv_id").orderBy("conv_id").first()["conv_id"]
    n_expected = df.where(F.col("conv_id") == target).count()

    blocks = spark.read.parquet(f"{out}/blocks")
    pruned = prune_blocks(blocks, conv_id=target)
    assert 0 < pruned.count() < blocks.count()  # actually pruned

    dec = decode_dir(spark, out, conv_id=target)
    assert dec.count() == n_expected
    assert dec.select("conv_id").distinct().collect()[0][0] == target


def test_time_range_prune(spark, encoded):
    df, out = encoded
    lo, hi = df.agg(
        F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
        F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
    ).collect()[0]
    blocks = spark.read.parquet(f"{out}/blocks")
    # a point query at the global minimum timestamp: only blocks whose
    # range covers it survive (hash-mixed blocks each span wide ranges,
    # so only narrow predicates prune on ts; conv_id zone maps are the
    # primary pruning axis for this clustering)
    pruned = prune_blocks(blocks, ts_range_us=(lo, lo))
    assert 0 < pruned.count() < blocks.count()
    full = prune_blocks(blocks, ts_range_us=(lo, hi))
    assert full.count() == blocks.count()


def test_column_pruned_decode(spark, encoded):
    df, out = encoded
    dec = decode_dir(spark, out, columns=["conv_id", "turn_idx", "role"])
    assert dec.columns == ["conv_id", "turn_idx", "role"]
    src = df.select("conv_id", "turn_idx", "role")
    assert dec.count() == src.count()
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0


def test_generic_zone_map_pruning(spark):
    """Per-column zone maps prune blocks for arbitrary range predicates —
    int (event_id), float (value), and string (event_type) bounds — and
    the pruned decode still returns exactly the filtered rows."""
    import pyspark.sql.functions as F

    from sparrow_ipc_spark.operators.decode_job import decode_blocks, prune_blocks_col
    from sparrow_ipc_spark.operators.encode_job import (
        encode_table, infer_fields, spark_schema_for,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .repartitionByRange(8, "event_id").sortWithinPartitions("event_id")
    fields = infer_fields(ev)
    blocks_df, dr, _ = encode_table(spark, ev)
    blocks_df = blocks_df.cache()
    total_blocks = blocks_df.count()

    lo, hi = 100, 400
    pruned = prune_blocks_col(blocks_df, "event_id", lo=lo, hi=hi)
    kept = pruned.count()
    assert kept < total_blocks, "int zone map should skip blocks"
    dec = decode_blocks(spark, pruned, dr, schema=spark_schema_for(fields)) \
        .where(F.col("event_id").between(lo, hi))
    want = ev.where(F.col("event_id").between(lo, hi))
    assert dec.count() == want.count()
    assert dec.exceptAll(want).count() == 0

    # float + string bounds use their typed stat fields (survive or prune,
    # never lose rows)
    fpruned = prune_blocks_col(blocks_df, "value", lo=0.0, hi=50.0)
    fdec = decode_blocks(spark, fpruned, dr, schema=spark_schema_for(fields)) \
        .where(F.col("value").between(0.0, 50.0))
    assert fdec.count() == ev.where(F.col("value").between(0.0, 50.0)).count()
    spruned = prune_blocks_col(blocks_df, "event_type", lo="error", hi="error")
    sdec = decode_blocks(spark, spruned, dr, schema=spark_schema_for(fields)) \
        .where(F.col("event_type") == "error")
    assert sdec.count() == ev.where(F.col("event_type") == "error").count()
