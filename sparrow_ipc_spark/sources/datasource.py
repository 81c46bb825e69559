"""Spark Python Data Source for encoded block directories.

``spark.read.format("sparrow_ipc").load(out_dir)`` — the idiomatic Spark
surface over the decode path (the user-facing analog of the reference's
``deserialize_stream`` entry point, /root/reference/src/deserialize.cpp:
406-537).  Features:

* schema inference from the committed block metadata (no user schema
  needed);
* one input partition per blocks parquet file — embarrassingly parallel
  decode, no shuffle;
* **filter pushdown into the block zone maps** (Spark 4 `pushFilters`):
  comparison filters on any zone-mapped column skip whole blocks before
  their bodies are ever read or decompressed.  Pushdown is PARTIAL by
  design — zone maps prune at block granularity — so every filter is also
  returned to Spark for exact row-level re-evaluation;
* column pruning via ``.option("columns", "a,b")`` — unread columns'
  buffers are never decompressed (the Python DS API does not forward
  Spark's own column pruning, so it is surfaced as an option).

Registration: ``spark.dataSource.register(SparrowIPCDataSource)``.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from dataclasses import dataclass
from typing import Any

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

# (lo, hi) bound updates per filter type: closed-interval zone-map query
_RANGE_FILTERS = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)


def _blocks_files(path: str) -> list[str]:
    d = os.path.join(path, "blocks")
    if not os.path.isdir(d):
        raise ValueError(f"not an encoded directory (no blocks/): {path}")
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def _infer_fields(path: str) -> list[tuple[str, str]]:
    """(name, logical_type) from the first committed block's metadata."""
    import pyarrow.parquet as pq

    for f in _blocks_files(path):
        t = pq.read_table(f, columns=["columns"])
        if t.num_rows:
            cols = t.column("columns")[0].as_py()
            return [(c["name"], c["logical_type"]) for c in cols]
    raise ValueError(f"no committed blocks under {path}; cannot infer schema")


def _load_dict_rows(path: str) -> list[dict]:
    import pyarrow.parquet as pq

    d = os.path.join(path, "dictionaries")
    if not os.path.isdir(d):
        return []
    rows = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    return rows


@dataclass
class _FilePartition(InputPartition):
    file: str


def _to_us(v: Any) -> Any:
    """Timestamps arrive as datetime; zone stats store int64 microseconds."""
    import datetime

    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo or datetime.timezone.utc)
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(v, datetime.date):
        return (v - datetime.date(1970, 1, 1)).days
    return v


def _survives(row: dict, bounds: dict[str, tuple[Any, Any]]) -> bool:
    """Block-level zone-map check: True unless some pushed bound range is
    provably disjoint from the block's [zmin, zmax] for that column.
    Missing stats keep the block (conservative)."""
    if not bounds:
        return True
    stats = {c["name"]: c for c in row["columns"]}
    for col, (lo, hi) in bounds.items():
        c = stats.get(col)
        if c is None:
            continue
        for zmin_k, zmax_k in (("zmin_int", "zmax_int"), ("zmin_num", "zmax_num"),
                               ("zmin_str", "zmax_str")):
            zmin, zmax = c.get(zmin_k), c.get(zmax_k)
            if zmin is None or zmax is None:
                continue
            try:
                if lo is not None and zmax < lo:
                    return False
                if hi is not None and zmin > hi:
                    return False
            except TypeError:  # bound/stat type mismatch: don't prune
                pass
            break
    return True


class SparrowIPCReader(DataSourceReader):
    def __init__(self, options: dict, fields: list[tuple[str, str]]):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sparrow_ipc requires a path: .load(out_dir)")
        cols_opt = options.get("columns")
        self.columns = ([c.strip() for c in cols_opt.split(",")] if cols_opt else None)
        self.fields = fields
        self.dict_rows = _load_dict_rows(self.path)
        self.bounds: dict[str, tuple[Any, Any]] = {}

    def pushFilters(self, filters: list[Filter]):
        names = {n for n, _ in self.fields}
        for f in filters:
            if isinstance(f, _RANGE_FILTERS) and len(f.attribute) == 1 \
                    and f.attribute[0] in names and f.value is not None:
                col = f.attribute[0]
                v = _to_us(f.value)
                lo, hi = self.bounds.get(col, (None, None))
                if isinstance(f, EqualTo):
                    nlo, nhi = v, v
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    nlo, nhi = v, None
                else:
                    nlo, nhi = None, v
                if nlo is not None:
                    lo = nlo if lo is None else max(lo, nlo)
                if nhi is not None:
                    hi = nhi if hi is None else min(hi, nhi)
                self.bounds[col] = (lo, hi)
            # zone maps prune blocks, not rows: EVERY filter goes back to
            # Spark for exact evaluation (partial pushdown contract)
            yield f

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(f) for f in _blocks_files(self.path)]

    def read(self, partition: _FilePartition) -> Iterator:
        yield from _decode_file_rows(
            partition.file, self.fields, self.columns, self.dict_rows,
            bounds=self.bounds,
        )


def _decode_file_rows(file: str, fields, columns, dict_rows,
                      bounds=None) -> Iterator:
    """Shared block-file decode kernel for the batch and stream readers."""
    import pyarrow.parquet as pq

    from sparrow_ipc_spark.operators import blocks as B
    from sparrow_ipc_spark.operators.decode_job import load_dict_values

    ctx = {"dict_values": load_dict_values(dict_rows)}
    out_names = [n for n, _ in fields if columns is None or n in columns]
    pf = pq.ParquetFile(file)
    for batch in pf.iter_batches(batch_size=16):
        names = batch.schema.names
        body_col = batch.column(names.index("body"))
        for i in range(batch.num_rows):
            row = {n: batch.column(names.index(n))[i].as_py()
                   for n in names if n != "body"}
            if bounds and not _survives(row, bounds):
                continue
            row["body"] = memoryview(body_col[i].as_buffer())
            tbl = B.decode_block(row, ctx, columns=columns)
            yield from tbl.select(out_names).to_batches()


@dataclass
class _StreamPartition(InputPartition):
    file: str
    dict_rows: list


class SparrowIPCStreamReader(DataSourceStreamReader):
    """Incremental decode of a growing block directory: each micro-batch
    decodes the parquet block files not yet committed to the checkpoint.
    Block files are immutable once written (`write_encoded` append mode
    only adds new part files), so the file set IS the offset — the
    streaming analog of the reference's incremental deserializer
    (/root/reference/src/deserialize.cpp:406-537 consuming messages as
    they arrive)."""

    def __init__(self, options: dict, fields: list[tuple[str, str]]):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sparrow_ipc requires a path: .load(out_dir)")
        cols_opt = options.get("columns")
        self.columns = ([c.strip() for c in cols_opt.split(",")] if cols_opt else None)
        self.fields = fields

    def initialOffset(self) -> dict:
        return {"seen": []}

    def latestOffset(self) -> dict:
        return {"seen": [os.path.basename(f) for f in _blocks_files(self.path)]}

    def partitions(self, start: dict, end: dict):
        new = sorted(set(end.get("seen", [])) - set(start.get("seen", [])))
        if not new:
            return []
        # dictionary snapshot rides in the partition: delta rows appended
        # after these blocks were written merge by version on decode
        dict_rows = _load_dict_rows(self.path)
        d = os.path.join(self.path, "blocks")
        return [_StreamPartition(os.path.join(d, f), dict_rows) for f in new]

    def read(self, partition: _StreamPartition) -> Iterator:
        yield from _decode_file_rows(
            partition.file, self.fields, self.columns, partition.dict_rows
        )

    def commit(self, end: dict) -> None:
        pass


class SparrowIPCDataSource(DataSource):
    """Read-side data source over an encoded block directory."""

    def __init__(self, options: dict):
        super().__init__(options)
        self._fields = _infer_fields(options["path"])

    @classmethod
    def name(cls) -> str:
        return "sparrow_ipc"

    def schema(self):
        from sparrow_ipc_spark.operators.encode_job import spark_schema_for

        fields = self._fields
        cols_opt = self.options.get("columns")
        if cols_opt:
            keep = [c.strip() for c in cols_opt.split(",")]
            fields = [f for f in fields if f[0] in keep]
        return spark_schema_for(fields)

    def reader(self, schema) -> SparrowIPCReader:
        return SparrowIPCReader(dict(self.options), self._fields)

    def streamReader(self, schema) -> SparrowIPCStreamReader:
        return SparrowIPCStreamReader(dict(self.options), self._fields)
