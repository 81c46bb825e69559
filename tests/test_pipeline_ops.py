"""Pipeline composition operators: decontamination, stratified sampling,
quality filtering — semantics on planted inputs + physical-plan audits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparrow_ipc_spark.functions import pipeline as P
from sparrow_ipc_spark.plans import audit


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    for i in range(300):
        if i % 97 == 0:
            text = bench_text  # benchmark docs (doc_id % 97 == 0)
        elif i == 5:
            # contaminated: contains the benchmark 5-grams verbatim
            text = "intro words " + bench_text + " trailing words"
        elif i == 6:
            text = None
        elif i == 7:
            text = "tiny"
        elif i == 8:
            text = "!!! ??? ... ;;; ::: @@@ ###"  # low alpha
        else:
            text = f"document number {i} with enough plain words to pass the filter easily"
        rows.append((i, text, ["en", "de", "fr", "es"][i % 4], f"src{i % 3}"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).cache()


def test_decontaminate_finds_planted_overlap(docs):
    out = P.decontaminate(docs, n=5, bench_mod=97).collect()
    hits = {(r["corpus_id"], r["bench_id"]) for r in out}
    # doc 5 shares all 4 benchmark 5-grams with every benchmark doc
    assert all((5, b) in hits for b in (0, 97, 194))
    by_pair = {(r["corpus_id"], r["bench_id"]): r["n_shared"] for r in out}
    assert by_pair[(5, 0)] == 4  # 8-token bench text → 4 distinct 5-grams
    # clean docs share nothing
    assert all(c == 5 for c, _ in hits)


def test_stratified_sample_rates_and_determinism(docs):
    out1 = P.stratified_sample(docs).collect()
    out2 = P.stratified_sample(docs).collect()
    assert sorted(r["doc_id"] for r in out1) == sorted(r["doc_id"] for r in out2)
    kept = {r["doc_id"] for r in out1}
    assert 0 < len(kept) < 300
    for r in out1:  # every kept row respects its stratum threshold
        thr = "4000" if r["stratum"] == "en" else "8000"
        assert r["bucket"] < thr
    # no shuffle: a pure stateless map
    audit.assert_no_shuffle(P.stratified_sample(docs), "stratified_sample")


def test_stratified_sample_rate_one_keeps_all(docs):
    """rate ≥ 1.0 (incl. the fallback stratum) keeps EVERY row — the 'g'
    sentinel sorts above all hex buckets, so no 1/65536 silent drop."""
    out = P.stratified_sample(docs, rates={"en": 1.0, "de": 1.0, "fr": 1.0,
                                           "es": 1.0}).collect()
    assert len(out) == 300
    # fallback stratum (absent from rates) also keeps everything
    out2 = P.stratified_sample(docs, rates={"zz": 0.5}).collect()
    assert len(out2) == 300


def test_quality_filter_reasons(docs):
    out = {r["doc_id"]: r for r in P.quality_filter(docs).collect()}
    assert out[6]["reason"] == "null_text" and not out[6]["keep"]
    assert out[7]["reason"] == "too_short"
    assert out[8]["reason"] == "low_alpha"
    assert out[10]["reason"] == "ok" and out[10]["keep"]
    audit.assert_no_shuffle(P.quality_filter(docs), "quality_filter")


def test_decontaminate_no_cartesian(docs):
    plan = audit.simple_plan(P.decontaminate(docs, n=5))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_redact_pii_spans_and_counts(spark):
    rows = [
        (0, "mail me at jane.doe+x@sub.example.org please"),
        (1, "ssn 123-45-6789 on file"),
        (2, "call +1 (415) 555-0137 or 555.867.5309"),
        (3, "server at 10.0.0.1 and 203.0.113.255"),
        (4, None),
        (5, "clean text with no pii at all"),
        (6, "a@b.io and 1.2.3.4 together"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.redact_pii(df).collect()}
    assert out[0]["clean_text"] == "mail me at <EMAIL> please"
    assert out[0]["n_email"] == 1 and out[0]["pii_total"] == 1
    assert out[1]["clean_text"] == "ssn <SSN> on file"
    assert out[1]["n_ssn"] == 1 and out[1]["n_phone"] >= 0
    assert "<PHONE>" in out[2]["clean_text"] and out[2]["n_phone"] == 2
    assert out[3]["clean_text"] == "server at <IPV4> and <IPV4>"
    assert out[3]["n_ipv4"] == 2
    assert out[4]["clean_text"] is None and out[4]["pii_total"] == 0
    assert out[5]["clean_text"] == rows[5][1] and out[5]["pii_total"] == 0
    assert out[6]["clean_text"] == "<EMAIL> and <IPV4> together"


def test_redact_pii_no_shuffle(spark):
    rows = [(i, f"doc {i} a@b.io") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert audit.count_exchanges(P.redact_pii(df)) == 0
