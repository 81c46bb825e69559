"""Driver-contract conformance: every SQL-expressible query must match its
DuckDB oracle (row count + sorted values) at sf0.001, exactly as the
driver's harness does at sf0.01."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
# literal-table oracles encode the expected answer at the driver's gate
# scale (sf0.01); run those queries there
PER_QUERY_SF = {"codec_selection": "/root/testdata/sf0.01"}
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    spark_df = entry_mod.queries()[name](spark, PER_QUERY_SF.get(name, SF_DIR))
    got = canon(spark_df.toPandas())
    want = canon(duck.execute(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype != b.dtype:
            a, b = a.astype(object), b.astype(object)
        pd.testing.assert_series_equal(a, b, check_names=False, check_dtype=False)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["all_columns_identical"] is True
    assert r["text_mismatches"] == 0
    assert r["enc_bytes"] < r["raw_bytes"]


def test_rows_only_queries(spark):
    qs = entry_mod.queries()
    sel = qs["codec_selection"](spark, SF_DIR).collect()
    assert {r["col_name"] for r in sel} == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    topk = qs["cosine_topk"](spark, SF_DIR).collect()
    assert len(topk) == 10
    assert all(-1.0001 <= r["cosine"] <= 1.0001 for r in topk)
