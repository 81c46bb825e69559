"""Block assembly round trip at the pandas/pyarrow level (no Spark),
plus 8-byte alignment and buffer-descriptor invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sparrow_ipc_spark.operators import blocks
from sparrow_ipc_spark.operators.encode_job import TRANSCRIPT_FIELDS
from sparrow_ipc_spark.sources.transcripts import transcripts_pandas


def test_block_roundtrip_transcripts():
    pdf = transcripts_pandas(40, seed=42)
    row = blocks.encode_batch(pdf, TRANSCRIPT_FIELDS, {}, part_id=3, batch_seq=1)
    assert row["n_rows"] == len(pdf)
    # 8-byte alignment of every buffer offset (reference: utils.hpp:14-17)
    for b in row["buffers"]:
        assert b["offset"] % 8 == 0
    # field nodes carry exact (length, null_count)
    nodes = {fn["name"]: fn for fn in row["field_nodes"]}
    assert nodes["text"]["null_count"] == pdf["text"].isna().sum()
    assert nodes["tool"]["null_count"] == pdf["tool"].isna().sum()

    tbl = blocks.decode_block(row, {})
    out = tbl.to_pandas()
    for col in ("conv_id", "turn_idx", "role", "text", "tool"):
        pd.testing.assert_series_equal(out[col], pdf[col], check_names=False)
    # timestamps: µs-exact
    src_us = pdf["ts"].astype("datetime64[us]")
    dec_us = out["ts"].astype("datetime64[us]")
    assert (src_us == dec_us).all()
    assert row["enc_bytes"] < row["raw_bytes"]


def test_block_roundtrip_adversarial():
    n = 64
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * n,
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": ["user"] * n,
            "text": [rng.bytes(40).hex() for _ in range(n)],  # incompressible
            "tool": [None] * n,  # all null
            "ts": pd.to_datetime(np.zeros(n), unit="us"),  # epoch zeros
        }
    )
    row = blocks.encode_batch(pdf, TRANSCRIPT_FIELDS, {}, 0, 0)
    out = blocks.decode_block(row, {}).to_pandas()
    assert out["text"].tolist() == pdf["text"].tolist()
    assert out["tool"].isna().all()


def test_empty_batch():
    pdf = transcripts_pandas(1, seed=42).iloc[0:0]
    row = blocks.encode_batch(pdf, TRANSCRIPT_FIELDS, {}, 0, 0)
    assert row["n_rows"] == 0
    out = blocks.decode_block(row, {}).to_pandas()
    assert len(out) == 0
