"""Run-end-encoded (RLE) codec.

Semantics match the reference's run-end-encoded layout exactly
(/root/reference/src/deserialize_run_end_encoded_array.cpp:19-157):
``run_ends[i]`` is the EXCLUSIVE end index of run i; the logical array is
``values[j]`` repeated over ``[run_ends[j-1], run_ends[j])``.  Nulls form
runs like any other value (a null run has a null entry in ``values``).

Spark-side: run boundaries are found vectorized (factorize + shifted
compare); decode is ``values.take(np.repeat(...))`` — both C-speed, no
per-row Python.  Run ends are themselves delta+bit-packed (they are
strictly increasing, so deltas are the run lengths — small ints).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sparrow_ipc_spark.codecs import base, forbp, raw


def applicable(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t)
        or pa.types.is_integer(t) or pa.types.is_boolean(t)
        or pa.types.is_timestamp(t) or pa.types.is_date(t)
        or pa.types.is_duration(t) or pa.types.is_time(t)
    )


def run_bounds(arr: pa.Array) -> np.ndarray:
    """Start indices of runs (nulls count as a distinct value).

    Arrow shifted self-compare — no Python-object materialization (the old
    ``pd.factorize`` path boxed every string and dominated the selector's
    stats pass).  Null-aware: two adjacent nulls are the same run; a null
    next to a non-null is a boundary."""
    n = len(arr)
    if n <= 1:
        return np.zeros(min(n, 1), dtype=np.int64)
    a, b = arr.slice(1), arr.slice(0, n - 1)
    neq = pc.fill_null(pc.not_equal(a, b), True).to_numpy(zero_copy_only=False)
    if arr.null_count:
        nulls = arr.is_null().to_numpy(zero_copy_only=False)
        both_null = nulls[1:] & nulls[:-1]
        change_mask = np.asarray(neq, bool) & ~both_null
    else:
        change_mask = np.asarray(neq, bool)
    change = np.nonzero(change_mask)[0] + 1
    return np.concatenate(([0], change))


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type) or len(arr) == 0:
        return None
    starts = run_bounds(arr)
    n_runs = len(starts)
    run_ends = np.concatenate((starts[1:], [len(arr)])).astype(np.int64)
    values = arr.take(pa.array(starts, type=pa.int64()))
    # run_ends: strictly increasing → delta+bitpack via the FoR codec
    ends_enc = forbp.encode(pa.array(run_ends, type=pa.int64()), {"delta": True})
    values_enc = raw.encode(values, ctx)
    bufs: list[tuple[str, bytes]] = []
    for kind, b in ends_enc.buffers:
        bufs.append((f"re_{kind}", b))
    for kind, b in values_enc.buffers:
        bufs.append((f"v_{kind}", b))
    meta = {
        "n_runs": n_runs,
        "run_ends_meta": ends_enc.meta,
        "values_codec": values_enc.codec,
        "values_meta": values_enc.meta,
    }
    return base.EncodedColumn(codec="rle", meta=meta, buffers=bufs)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    n_runs = int(meta["n_runs"])
    re_bufs = {k[3:]: v for k, v in buffers.items() if k.startswith("re_")}
    v_bufs = {k[2:]: v for k, v in buffers.items() if k.startswith("v_")}
    run_ends_arr = base.decode_column(
        "for_bitpack", meta["run_ends_meta"], re_bufs, n_runs, pa.int64(), ctx
    )
    run_ends = run_ends_arr.to_numpy(zero_copy_only=False).astype(np.int64)
    values = base.decode_column(
        meta["values_codec"], meta["values_meta"], v_bufs, n_runs, dtype, ctx
    )
    lens = np.diff(run_ends, prepend=0)
    idx = np.repeat(np.arange(n_runs, dtype=np.int64), lens)
    if len(idx) != length:  # explicit: asserts vanish under PYTHONOPTIMIZE
        raise ValueError(f"rle run-ends expand to {len(idx)} values != {length}")
    return values.take(pa.array(idx, type=pa.int64()))


base.register("rle", encode, decode)
