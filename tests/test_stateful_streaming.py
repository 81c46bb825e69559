"""Stateful streaming operators: applyInPandasWithState progress tracking
(state carried across micro-batches) and watermarked windowed aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F

from sparrow_ipc_spark.sources.transcripts import transcripts_df
from sparrow_ipc_spark.streaming.stateful import conversation_progress, turns_per_window


def test_conversation_progress_state_across_batches(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("st_src"))
    df = transcripts_df(spark, n_convs=12, seed=42).cache()
    # two files → two micro-batches (maxFilesPerTrigger=1): state must carry
    half = df.where("pmod(turn_idx, 2) = 0")
    half.coalesce(1).write.mode("append").parquet(src)
    df.subtract(half).coalesce(1).write.mode("append").parquet(src)

    q = (
        conversation_progress(
            spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        .writeStream.format("memory").queryName("prog").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    out = spark.sql("select * from prog")
    # last update per conversation must equal the batch ground truth
    final = (
        out.groupBy("conv_id").agg(F.max("n_turns").alias("n_turns"),
                                   F.max("max_turn_idx").alias("max_turn_idx"))
    )
    truth = df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn_idx")
    )
    assert final.exceptAll(truth).count() == 0 and truth.exceptAll(final).count() == 0


def test_turns_per_window_matches_batch(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("w_src"))
    df = transcripts_df(spark, n_convs=20, seed=42).cache()
    df.coalesce(2).write.mode("overwrite").parquet(src)
    # complete mode: append would hold back windows newer than the
    # watermark (they only finalize when a later batch advances it)
    q = (
        turns_per_window(spark.readStream.schema(df.schema).parquet(src))
        .writeStream.format("memory").queryName("tpw").outputMode("complete")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from tpw")
    want = (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                "role", "n_turns")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
