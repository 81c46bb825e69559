"""Table schemas: transcripts in, encoded blocks + dictionaries + manifest out.

The encoded-block row is the Spark-native analog of one Arrow IPC
``Message{header=RecordBatch}`` (reference: Message.fbs:86-108 —
``RecordBatch{nodes, buffers, compression}``; framing
src/encapsulated_message.cpp:10-115):

* ``field_nodes``  ↔ FieldNode (length, null_count) per column, depth-first
  (reference: src/flatbuffer_utils.cpp:746-769);
* ``buffers``      ↔ Buffer (offset, length) descriptors with 8-byte-aligned
  offsets (reference: include/sparrow_ipc/flatbuffer_utils.hpp:188-226),
  extended with per-buffer codec tags — the reference only distinguishes
  LZ4/ZSTD/none (src/compression.cpp:127-154); we generalize the enum to
  the full lightweight-codec set while keeping per-buffer granularity
  (BodyCompressionMethod::BUFFER, Message.fbs:58-80);
* ``body``         ↔ the message body: depth-first concatenation of every
  encoded buffer, each padded to 8 bytes (src/serialize_utils.cpp:12-40);
* dictionary rows  ↔ DictionaryBatch messages emitted once, before data
  batches (Message.fbs:129-131; src/dictionary_tracker.cpp:284-298).
"""

from __future__ import annotations

import pyspark.sql.types as T

# ---------------------------------------------------------------------------
# Input: transcripts (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

TRANSCRIPT_COLUMNS = [f.name for f in TRANSCRIPTS_SCHEMA.fields]

# ---------------------------------------------------------------------------
# Output: encoded-block table (one row per Arrow batch per partition)
# ---------------------------------------------------------------------------
# columns[i].meta_json carries codec params (dict_id, FoR reference, bit
# width, symbol-table size, ...) — the analog of the FlatBuffers type +
# DictionaryEncoding schema nodes (src/flatbuffer_utils.cpp:501-693).
BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("batch_seq", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField(
            "field_nodes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("length", T.LongType(), False),
                        T.StructField("null_count", T.LongType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType(), False),
                        T.StructField("logical_type", T.StringType(), False),
                        T.StructField("codec", T.StringType(), False),
                        T.StructField("meta_json", T.StringType(), False),
                        # generic per-column zone maps (typed so integer
                        # ranges never round-trip through doubles): decode
                        # jobs prune blocks on ANY orderable column before
                        # touching bodies; null stats = "don't prune"
                        T.StructField("zmin_int", T.LongType(), True),
                        T.StructField("zmax_int", T.LongType(), True),
                        T.StructField("zmin_num", T.DoubleType(), True),
                        T.StructField("zmax_num", T.DoubleType(), True),
                        T.StructField("zmin_str", T.StringType(), True),
                        T.StructField("zmax_str", T.StringType(), True),
                    ]
                )
            ),
            False,
        ),
        T.StructField(
            "buffers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("col_idx", T.IntegerType(), False),
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("codec", T.StringType(), False),
                        T.StructField("offset", T.LongType(), False),
                        T.StructField("comp_len", T.LongType(), False),
                        T.StructField("uncomp_len", T.LongType(), False),
                    ]
                )
            ),
            False,
        ),
        T.StructField("dict_refs", T.ArrayType(T.LongType()), False),
        # zone maps: per-block min/max of the clustering keys — the random-
        # access analog of the IPC file Footer's per-block index
        # (/root/reference/src/stream_file_serializer.cpp:77-129): decode
        # jobs prune blocks by conv_id / time range before touching bodies
        T.StructField("conv_min", T.StringType(), True),
        T.StructField("conv_max", T.StringType(), True),
        T.StructField("ts_min_us", T.LongType(), True),
        T.StructField("ts_max_us", T.LongType(), True),
        T.StructField("body", T.BinaryType(), False),
        # integrity: crc32 of the body (the analog of the reference's
        # exact-size decompress validation, compression.cpp:176-190)
        T.StructField("body_crc32", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Dictionary table (one row per dictionary batch; emit-once per dict_id)
# ---------------------------------------------------------------------------
DICTIONARY_SCHEMA = T.StructType(
    [
        T.StructField("dict_id", T.LongType(), False),
        T.StructField("col_name", T.StringType(), False),
        T.StructField("is_delta", T.BooleanType(), False),
        # concat order for delta merge (reference: dictionary_cache.cpp:20-111
        # appends delta values to the stored dictionary in arrival order)
        T.StructField("version", T.LongType(), False),
        T.StructField("n_values", T.LongType(), False),
        # dictionary values as a length-prefixed utf-8 blob (offsets+data),
        # the 1-column record batch of a DictionaryBatch message
        T.StructField("values_offsets", T.BinaryType(), False),
        T.StructField("values_data", T.BinaryType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Manifest / checkpoint table (the analog of the IPC file Footer,
# src/stream_file_serializer.cpp:34-129): per-partition lineage + metrics,
# enables resumable re-runs (skip part_ids already committed).
# ---------------------------------------------------------------------------
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("n_blocks", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("codec_summary", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        # write-job index that committed this partition (Iceberg-snapshot
        # analog): monotonically increasing per write_encoded call, enables
        # time-travel decode (decode_dir(..., snapshot=K))
        T.StructField("snapshot", T.LongType(), False),
        # physical mapping recorded at commit: which blocks/ file holds the
        # partition, and that file's parquet row-group count — lets the
        # data source plan row-group read spans with zero footer I/O
        # (nullable: legacy manifests predate these)
        T.StructField("file", T.StringType(), True),
        T.StructField("file_row_groups", T.LongType(), True),
        # the part-id offset the committing job encoded against — recorded
        # so a replayed micro-batch commit reuses it exactly (nullable)
        T.StructField("part_offset", T.LongType(), True),
    ]
)

# Logical (encode-side) type tags — the analog of the format-string switch
# in src/flatbuffer_utils.cpp:86-447, restricted to the types the
# transcripts schema + adversarial fixtures need.
LOGICAL_TYPES = {
    "string": "string",
    "large_string": "large_string",
    "binary": "binary",
    "int8": "int8",
    "int16": "int16",
    "int32": "int32",
    "int64": "int64",
    "float32": "float32",
    "float64": "float64",
    "bool": "bool",
    "timestamp[us]": "timestamp[us]",
    "date32[day]": "date32[day]",
}


def arrow_block_schema():
    """pyarrow schema mirroring BLOCK_SCHEMA (for mapInArrow encode)."""
    import pyarrow as pa

    return pa.schema(
        [
            ("part_id", pa.int32()),
            ("batch_seq", pa.int32()),
            ("n_rows", pa.int64()),
            ("field_nodes", pa.list_(pa.struct(
                [("name", pa.string()), ("length", pa.int64()), ("null_count", pa.int64())]))),
            ("columns", pa.list_(pa.struct(
                [("name", pa.string()), ("logical_type", pa.string()),
                 ("codec", pa.string()), ("meta_json", pa.string()),
                 ("zmin_int", pa.int64()), ("zmax_int", pa.int64()),
                 ("zmin_num", pa.float64()), ("zmax_num", pa.float64()),
                 ("zmin_str", pa.string()), ("zmax_str", pa.string())]))),
            ("buffers", pa.list_(pa.struct(
                [("col_idx", pa.int32()), ("kind", pa.string()), ("codec", pa.string()),
                 ("offset", pa.int64()), ("comp_len", pa.int64()), ("uncomp_len", pa.int64())]))),
            ("dict_refs", pa.list_(pa.int64())),
            ("conv_min", pa.string()),
            ("conv_max", pa.string()),
            ("ts_min_us", pa.int64()),
            ("ts_max_us", pa.int64()),
            ("body", pa.binary()),
            ("body_crc32", pa.int64()),
            ("raw_bytes", pa.int64()),
            ("enc_bytes", pa.int64()),
        ]
    )
