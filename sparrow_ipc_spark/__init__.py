"""sparrow_ipc_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch reimagination of the Arrow IPC record-batch encode/decode
pipeline (reference: sparrow-org/sparrow-ipc, C++20) as a distributed codec
engine over tables of multi-turn conversation / agent transcripts:

* per-column codecs: dictionary, RLE (run-end encoded), frame-of-reference +
  bit-packing (with optional delta + zigzag), FSST-style symbol-table text
  compression, general-purpose zstd/lz4, raw passthrough;
* per-buffer codec auto-selection with a never-inflate raw fallback
  (reference semantics: /root/reference/src/compression.cpp:218-254);
* encoded blocks carry Arrow-IPC-style schema + buffer-layout metadata
  (field nodes, per-buffer (offset, length, codec), 8-byte aligned body —
  /root/reference/src/serialize_utils.cpp:12-40) so decode reproduces every
  column bit-identical under stable (conv_id, turn_idx) ordering;
* dictionary batches are built in a separate Spark stage and emitted once
  before data blocks (reference: src/dictionary_tracker.cpp:233-307);
* everything vectorized: DataFrame ops + mapInPandas over Arrow batches —
  no per-row Python in the hot path.
"""

__version__ = "0.1.0"

from sparrow_ipc_spark.session import get_spark  # noqa: F401

# lazy top-level surface (PEP 562): the heavy operator modules load on
# first use, not at package import
_LAZY = {
    "write_encoded": ("sparrow_ipc_spark.operators.encode_job", "write_encoded"),
    "encode_table": ("sparrow_ipc_spark.operators.encode_job", "encode_table"),
    "decode_dir": ("sparrow_ipc_spark.operators.decode_job", "decode_dir"),
    "snapshots": ("sparrow_ipc_spark.operators.decode_job", "snapshots"),
    "roundtrip_report": ("sparrow_ipc_spark.operators.verify", "roundtrip_report"),
    "read_encoded": ("sparrow_ipc_spark.sources.datasource", "read_encoded"),
    "SparrowIPCDataSource": ("sparrow_ipc_spark.sources.datasource",
                             "SparrowIPCDataSource"),
    "transcripts_df": ("sparrow_ipc_spark.sources.transcripts", "transcripts_df"),
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
