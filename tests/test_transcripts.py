"""Deterministic generator properties (FIXTURES.md F1)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparrow_ipc_spark.sources.transcripts import transcripts_pandas


def test_deterministic():
    a = transcripts_pandas(30, seed=42)
    b = transcripts_pandas(30, seed=42)
    pd.testing.assert_frame_equal(a, b)
    c = transcripts_pandas(30, seed=43)
    assert not a.equals(c)


def test_schema_and_invariants():
    pdf = transcripts_pandas(100, seed=42)
    assert list(pdf.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert pdf["turn_idx"].dtype == np.int32
    g = pdf.groupby("conv_id", sort=False)
    # turn_idx is 0..n-1 per conversation; ts strictly increasing
    for _, grp in list(g)[:20]:
        assert (grp["turn_idx"].to_numpy() == np.arange(len(grp))).all()
        ts = grp["ts"].to_numpy()
        assert (np.diff(ts.astype("datetime64[us]").astype(np.int64)) > 0).all()
    assert set(pdf["role"].unique()) <= {"user", "assistant", "system", "tool"}
    assert pdf["tool"].isna().mean() > 0.5
    assert pdf["text"].isna().any()


def test_hot_conversation_knob():
    pdf = transcripts_pandas(4, seed=42, hot_every=2, hot_turns=500)
    sizes = pdf.groupby("conv_id").size()
    assert sizes.max() == 500
