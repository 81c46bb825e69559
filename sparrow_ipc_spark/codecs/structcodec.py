"""Struct codec: children recursively encoded with their own best codecs.

Mirrors the reference's struct kernel (/root/reference/src/
array_deserializer.cpp:389-495: validity buffer, then children decoded
sequentially, same length) with the engine twist that each child gets the
full codec auto-selection (a struct<role:string, score:float> encodes its
role child with a dictionary and its score child byte-shuffled).

Buffer kinds are prefixed ``c{i}_`` per child — the depth-first positional
cursor contract (deserialization_context.hpp:32-52) flattened into named
kinds.
"""

from __future__ import annotations

import pyarrow as pa

from sparrow_ipc_spark.codecs import base


def applicable(t: pa.DataType) -> bool:
    return pa.types.is_struct(t)


def encode(arr: pa.Array, ctx: dict) -> base.EncodedColumn | None:
    if not applicable(arr.type):
        return None
    import numpy as np

    bufs: list[tuple[str, bytes]] = []
    vb = base.validity_bytes(arr)
    if vb is not None:
        bufs.append(("validity", vb))
    null_idx = None
    if arr.null_count:
        # canonicalize child slots under null struct entries to null (take
        # with null indices — works for every child type): encoded bytes
        # must be a pure function of LOGICAL content, or Spark task retries
        # / replay byte comparisons see spurious body differences from
        # whatever junk the producer left under masked slots
        valid_np = np.logical_not(arr.is_null().to_numpy(zero_copy_only=False))
        null_idx = pa.array(np.arange(len(arr), dtype=np.int64), mask=~valid_np)
    children_meta = []
    for i in range(arr.type.num_fields):
        field = arr.type.field(i)
        child = arr.field(i)
        if null_idx is not None:
            child = child.take(null_idx)
        from sparrow_ipc_spark.codecs import selector

        enc = selector.select_unframed(
            child, {**ctx, "col_name": f"{ctx.get('col_name', '')}.{field.name}"}
        )
        children_meta.append(
            {
                "name": field.name,
                "logical": base.logical_str(field.type),
                "codec": enc.codec,
                "meta": enc.meta,
            }
        )
        for kind, payload in enc.buffers:
            bufs.append((f"c{i}_{kind}", payload))
    return base.EncodedColumn(codec="struct", meta={"children": children_meta}, buffers=bufs)


def decode(meta: dict, buffers: dict[str, bytes], length: int, dtype: pa.DataType,
           ctx: dict) -> pa.Array:
    valid = base.validity_from_bytes(buffers.get("validity"), length)
    children, names = [], []
    for i, cm in enumerate(meta["children"]):
        prefix = f"c{i}_"
        cbufs = {k[len(prefix):]: v for k, v in buffers.items() if k.startswith(prefix)}
        ct = base.dtype_from_logical(cm["logical"])
        children.append(base.decode_column(cm["codec"], cm["meta"], cbufs, length, ct, ctx))
        names.append(cm["name"])
    import numpy as np

    mask = None if valid is None else pa.array(~np.asarray(valid))
    out = pa.StructArray.from_arrays(children, names, mask=mask)
    if out.type != dtype:
        out = out.cast(dtype)
    return out


base.register("struct", encode, decode)
