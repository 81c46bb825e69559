"""Arrow IPC stream interop: write/read genuine ``.arrows`` stream files.

This is FORMAT-level parity with the reference: sparrow-ipc's entire
purpose is serializing record batches to the Arrow IPC stream format
(/root/reference/src/serialize.cpp:15-65 schema+batch messages,
/root/reference/src/deserialize.cpp:406-537 stream decode), with optional
per-buffer LZ4/ZSTD body compression (/root/reference/src/compression.cpp:
127-205).  Files produced here are plain Arrow IPC streams — the reference
itself (or any Arrow implementation) can deserialize them, and vice versa:
streams the reference serializes load straight into a DataFrame here.

Distributed shape: one stream file per partition written from the task
(``mapInArrow``), read back via Spark's ``binaryFile`` source so the scan
parallelizes across files.  At cluster scale the local ``open()`` swaps
for the distributed filesystem client; everything else is unchanged.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.ipc as ipc
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession

_WRITE_REPORT = "path string, rows long, bytes long"


def _ipc_options(compression: str | None, level: int | None = None):
    if compression is None or compression == "none":
        return ipc.IpcWriteOptions()
    codec = pa.Codec(compression, compression_level=level) if level is not None else pa.Codec(compression)
    return ipc.IpcWriteOptions(compression=codec)


def write_ipc_stream(df: DataFrame, out_dir: str, compression: str | None = "zstd",
                     level: int | None = 1) -> list[dict]:
    """Write each partition as one Arrow IPC stream file; returns per-file
    (path, rows, bytes) report rows.  ``zstd`` level 1 matches the codec +
    level the reference pins (/root/reference/src/compression.cpp:197)."""
    os.makedirs(out_dir, exist_ok=True)
    # a re-export with fewer partitions would otherwise leave stale
    # part-NNNNN.arrows from a previous run, and read_ipc_stream globs
    # every *.arrows — silently mixing old rows into the read
    for f in os.listdir(out_dir):
        if f.endswith(".arrows"):
            os.remove(os.path.join(out_dir, f))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        opts = _ipc_options(compression, level)  # IpcWriteOptions is not picklable
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        path = os.path.join(out_dir, f"part-{pid:05d}.arrows")
        writer = None
        sink = None
        rows = 0
        for batch in batches:
            if writer is None:
                sink = open(path, "wb")
                writer = ipc.new_stream(sink, batch.schema, options=opts)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is not None:
            writer.close()
            sink.close()
            yield pa.RecordBatch.from_pylist(
                [{"path": path, "rows": rows, "bytes": os.path.getsize(path)}],
                schema=pa.schema([("path", pa.string()), ("rows", pa.int64()),
                                  ("bytes", pa.int64())]),
            )

    return [r.asDict() for r in df.mapInArrow(fn, _WRITE_REPORT).collect()]


def read_ipc_stream(spark: SparkSession, in_dir: str) -> DataFrame:
    """Read a directory of Arrow IPC stream files back into a DataFrame.

    The schema comes from the first file's schema message (the stream
    format is self-describing); each file decodes independently inside
    ``mapInArrow`` — embarrassingly parallel, no shuffle."""
    import glob as _glob

    from pyspark.sql.pandas.types import from_arrow_schema

    paths = sorted(_glob.glob(os.path.join(in_dir, "*.arrows")))
    if not paths:
        raise FileNotFoundError(f"no .arrows files under {in_dir}")
    with ipc.open_stream(paths[0]) as r:
        arrow_schema = r.schema
    out_schema = from_arrow_schema(arrow_schema)

    files = spark.read.format("binaryFile").load(os.path.join(in_dir, "*.arrows"))

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            content = batch.column(batch.schema.names.index("content"))
            for i in range(batch.num_rows):
                buf = content[i].as_buffer()  # zero-copy over the Arrow buffer
                with ipc.open_stream(buf) as reader:
                    yield from reader

    return files.select("content").mapInArrow(fn, out_schema)
