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


def _legacy_conversation(seed, conv_idx, vocab, phrases, tools, word_probs,
                         mean_turns=12, hot_every=0, hot_turns=5000):
    """The original per-row ' '.join generator — the vectorized builder in
    sources/transcripts.py must reproduce it byte-for-byte."""
    from sparrow_ipc_spark.sources.transcripts import ROLES, ROLE_P, conv_turn_count

    rng = np.random.default_rng([seed, conv_idx])
    n = conv_turn_count(seed, conv_idx, mean_turns, hot_every, hot_turns)
    conv_id = f"conv_{rng.integers(0, 2**32):08x}_{conv_idx:06d}"
    roles = ROLES[rng.choice(4, size=n, p=ROLE_P)]
    roles[0] = "system" if rng.random() < 0.3 else "user"
    tool_vals = np.full(n, None, dtype=object)
    tool_mask = (roles == "tool") | ((roles == "assistant") & (rng.random(n) < 0.08))
    tool_vals[tool_mask] = tools[rng.integers(0, len(tools), size=int(tool_mask.sum()))]
    n_words = np.clip(rng.lognormal(2.3, 0.9, size=n).astype(np.int64), 1, 400)
    draws = rng.choice(len(vocab), size=int(n_words.sum()), p=word_probs)
    pieces = np.split(vocab[draws], np.cumsum(n_words)[:-1])
    texts = np.empty(n, dtype=object)
    phrase_mask = rng.random(n) < 0.25
    phrase_pick = rng.integers(0, len(phrases), size=n)
    for i in range(n):
        t = " ".join(pieces[i])
        if phrase_mask[i]:
            t = phrases[phrase_pick[i]] + " " + t
        texts[i] = t
    u = rng.random(n)
    texts[u < 0.01] = None
    texts[(u >= 0.01) & (u < 0.015)] = ""
    start = 1735689600_000_000 + int(rng.integers(0, 365 * 86400)) * 1_000_000
    deltas = rng.integers(1_000_000, 300_000_000, size=n)
    ts_us = start + np.cumsum(deltas) - deltas[0]
    return pd.DataFrame({
        "conv_id": np.full(n, conv_id, dtype=object),
        "turn_idx": np.arange(n, dtype=np.int32),
        "role": roles, "text": texts, "tool": tool_vals,
        "ts": pd.to_datetime(ts_us, unit="us"),
    })


def test_build_texts_edges():
    """Direct edge coverage of the vectorized text builder: all-null,
    all-empty, single-word texts, phrase-only rows."""
    import pyarrow as pa

    from sparrow_ipc_spark.sources.transcripts import _build_texts, build_text_tables

    vocab = np.array(["aa", "b", "ccc"], dtype=object)
    phrases = ["X Y"]
    tables = build_text_tables(vocab, phrases)

    def run(n_words, draws, pmask, ppick, u):
        return _build_texts(
            tables, np.array(n_words, np.int64), np.array(draws, np.int64),
            np.array(pmask, bool), np.array(ppick, np.int64), np.array(u),
        ).to_pylist()

    # all null
    assert run([2, 1], [0, 1, 2], [False, False], [0, 0], [0.0, 0.005]) == [None, None]
    # all empty
    assert run([1, 1], [0, 1], [False, False], [0, 0], [0.012, 0.014]) == ["", ""]
    # plain + phrase-prefixed + null mixed; draws for the null row are
    # consumed but not rendered
    out = run([2, 1, 2], [0, 2, 1, 2, 0], [False, True, False], [0, 0, 0],
              [0.5, 0.5, 0.001])
    assert out == ["aa ccc", "X Y b", None]
    # zero rows
    assert run([], [], [], [], []) == []


def test_vectorized_builder_matches_legacy():
    from sparrow_ipc_spark.sources.transcripts import (
        build_phrases, build_tools, build_vocab, gen_conversation,
    )

    vocab = build_vocab(42)
    probs = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    probs /= probs.sum()
    phrases = build_phrases(vocab, 42)
    tools = build_tools(42)
    for ci in list(range(60)) + [1000, 54321]:
        new = gen_conversation(42, ci, vocab, phrases, tools, probs)
        old = _legacy_conversation(42, ci, vocab, phrases, tools, probs)
        for c in ("conv_id", "turn_idx", "role", "text", "tool"):
            assert list(new[c]) == list(old[c]), (ci, c)
        assert (new["ts"].astype("datetime64[us]").to_numpy()
                == old["ts"].astype("datetime64[us]").to_numpy()).all(), ci
