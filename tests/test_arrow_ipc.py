"""Arrow IPC stream interop: files we write are genuine Arrow IPC streams
(readable by plain pyarrow — i.e. by the reference's own decode path), and
streams written by plain pyarrow load back bit-identically."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest

from sparrow_ipc_spark.operators.verify import column_fingerprints
from sparrow_ipc_spark.sources.arrow_ipc import read_ipc_stream, write_ipc_stream
from sparrow_ipc_spark.sources.transcripts import transcripts_df


@pytest.mark.parametrize("compression", [None, "lz4", "zstd"])
def test_ipc_stream_roundtrip(spark, tmp_path_factory, compression):
    out = str(tmp_path_factory.mktemp(f"ipc_{compression}"))
    df = transcripts_df(spark, n_convs=30, seed=42).repartition(3).cache()
    report = write_ipc_stream(df, out, compression=compression)
    assert sum(r["rows"] for r in report) == df.count()
    # files are plain Arrow IPC streams: pyarrow reads them directly
    for path in glob.glob(os.path.join(out, "*.arrows")):
        with ipc.open_stream(path) as r:
            tbl = r.read_all()
            assert tbl.num_rows > 0
    back = read_ipc_stream(spark, out)
    assert column_fingerprints(df) == column_fingerprints(back)


def test_foreign_ipc_stream_loads(spark, tmp_path_factory):
    """A stream produced by plain pyarrow (≡ reference serializer output)
    loads into a DataFrame unchanged."""
    out = str(tmp_path_factory.mktemp("ipc_foreign"))
    tbl = pa.table(
        {
            "k": pa.array([1, 2, None, 4], type=pa.int64()),
            "s": pa.array(["a", None, "cc", "dddd"]),
        }
    )
    opts = ipc.IpcWriteOptions(compression=pa.Codec("zstd", compression_level=1))
    with ipc.new_stream(os.path.join(out, "part-00000.arrows"), tbl.schema, options=opts) as w:
        w.write_table(tbl)
    back = read_ipc_stream(spark, out)
    assert sorted(((r["k"], r["s"]) for r in back.collect()),
                  key=lambda t: (t[0] is None, t[0] or 0)) == [
        (1, "a"), (2, None), (4, "dddd"), (None, "cc")]


def test_reexport_clears_stale_files(spark, tmp_path):
    """Re-exporting fewer partitions into the same dir must not leave the
    previous run's part files for read_ipc_stream to silently mix in."""
    from sparrow_ipc_spark.sources.arrow_ipc import read_ipc_stream, write_ipc_stream

    out = str(tmp_path / "ipc")
    df8 = spark.range(0, 100).selectExpr("id", "concat('x', id) as s").repartition(8)
    write_ipc_stream(df8, out)
    df2 = spark.range(0, 40).selectExpr("id", "concat('y', id) as s").repartition(2)
    write_ipc_stream(df2, out)
    back = read_ipc_stream(spark, out)
    assert back.count() == 40
