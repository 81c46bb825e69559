"""Distributed decode job: block + dictionary tables → transcripts DataFrame.

The Spark analog of ``deserialize_stream_to_record_batches``
(/root/reference/src/deserialize.cpp:406-537): dictionaries are loaded
first (DictionaryBatch before RecordBatch ordering), broadcast to every
task (the decode-side dictionary_cache, /root/reference/src/
dictionary_cache.cpp:114-172), then every block decodes independently in
``mapInPandas`` — embarrassingly parallel, no shuffle at all; ordering is
restored lazily by the consumer (``orderBy(conv_id, turn_idx)``) only when
a globally sorted view is required.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from sparrow_ipc_spark.operators import blocks
from sparrow_ipc_spark.schema import TRANSCRIPTS_SCHEMA


def load_dict_values(dict_rows: list[dict]) -> dict[int, pa.Array]:
    """dict_id → values array (decode-side dictionary cache)."""
    out: dict[int, pa.Array] = {}
    for r in dict_rows:
        n = int(r["n_values"])
        offs = np.frombuffer(r["values_offsets"], dtype=np.int32)
        data = r["values_data"] or b""
        out[int(r["dict_id"])] = pa.Array.from_buffers(
            pa.string(), n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(bytes(data))], 0
        )
    return out


def decode_blocks(
    spark: SparkSession,
    blocks_df: DataFrame,
    dict_rows: list[dict],
    schema=TRANSCRIPTS_SCHEMA,
) -> DataFrame:
    bc = spark.sparkContext.broadcast(
        [
            {k: r[k] for k in ("dict_id", "n_values", "values_offsets", "values_data")}
            for r in dict_rows
        ]
    )

    def decode_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = {"dict_values": load_dict_values(bc.value)}
        for pdf in batches:
            for _, row in pdf.iterrows():  # one block row at a time (few per batch)
                tbl = blocks.decode_block(row.to_dict(), ctx)
                yield tbl.to_pandas()

    return blocks_df.mapInPandas(decode_fn, schema=schema)


def decode_dir(spark: SparkSession, out_dir: str, schema=TRANSCRIPTS_SCHEMA) -> DataFrame:
    blocks_df = spark.read.parquet(f"{out_dir}/blocks")
    dict_rows = [r.asDict() for r in spark.read.parquet(f"{out_dir}/dictionaries").collect()]
    return decode_blocks(spark, blocks_df, dict_rows, schema)
