"""FSST byte-level properties: round trip on arbitrary byte strings,
escape-chain disambiguation, symbol-table determinism."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sparrow_ipc_spark.codecs import fsst


def rt(data: bytes, train_on: bytes | None = None) -> int:
    symtab = fsst.train(train_on if train_on is not None else data)
    enc = fsst.compress(data, symtab)
    assert fsst.decompress(enc, symtab, len(data)) == data
    return len(enc)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=2000))
def test_arbitrary_bytes_roundtrip(data):
    rt(data)


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=500), st.binary(min_size=0, max_size=500))
def test_mismatched_table_roundtrip(data, sample):
    # table trained on different data must still round-trip (escapes)
    rt(data, train_on=sample)


def test_escape_chains():
    # runs of 0xFF exercise the escape-parity disambiguation
    for k in range(1, 20):
        data = b"\xff" * k
        rt(data)
        rt(b"a" + data + b"b")
        rt(data + b"ab" * 10 + data)


def test_compresses_repetitive_text():
    data = ("the quick brown fox jumps over the lazy dog " * 500).encode()
    assert rt(data) < len(data) * 0.7


def test_table_deterministic():
    rng = np.random.default_rng(7)
    data = rng.bytes(5000) + b"hello world " * 300
    assert fsst.train(data) == fsst.train(data)


def test_unicode_exact():
    data = ("日本語テキスト🎉 مرحبا עִברִית héllo\n" * 100).encode()
    rt(data)
