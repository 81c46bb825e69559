"""Global-dictionary lifecycle: cardinality guard (driver-safety at scale)
and delta-append on the batch resume path (reference delta rules:
/root/reference/src/dictionary_cache.cpp:20-111,
dictionary_tracker.cpp:128-169)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparrow_ipc_spark.operators.decode_job import decode_dir
from sparrow_ipc_spark.operators.encode_job import build_global_dicts, write_encoded
from sparrow_ipc_spark.operators.verify import roundtrip_report


def test_cardinality_guard_high_distinct(spark):
    """A 10^6-distinct column listed as a dict col must degrade (no global
    dictionary) without collecting the distinct set to the driver."""
    df = spark.range(1_000_000).select(
        F.concat(F.lit("val_"), F.col("id").cast("string")).alias("wide"),
        (F.col("id") % 4).cast("string").alias("narrow"),
    )
    rows, payload = build_global_dicts(df, cols=("wide", "narrow"))
    assert "wide" not in payload, "high-cardinality column must fall back"
    assert "narrow" in payload and len(payload["narrow"]["values"]) == 4
    assert {r["col_name"] for r in rows} == {"narrow"}


def test_batch_resume_emits_delta_dictionaries(spark, tmp_path_factory):
    """Append run with new dictionary values: committed dictionaries stay,
    fresh values arrive as is_delta rows, and blocks from BOTH runs decode
    bit-identically against the merged dictionary."""
    out = str(tmp_path_factory.mktemp("batch_delta"))
    mk = lambda lo, hi, prefix: spark.range(lo, hi).select(
        F.concat(F.lit("conv"), (F.col("id") % 7).cast("string")).alias("conv_id"),
        (F.col("id") % 50).cast("int").alias("turn_idx"),
        F.concat(F.lit(prefix), (F.col("id") % 300).cast("string")).alias("role"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
        F.lit("tool_x").alias("tool"),
        F.timestamp_seconds(F.col("id") + 1_700_000_000).alias("ts"),
    )
    df1 = mk(0, 500, "roleA_")
    write_encoded(spark, df1, out, n_parts=4)
    # append run: NEW rows land in fresh part ids past the committed ones;
    # roles are a fresh value set → must arrive as delta dictionary rows
    df2 = mk(500, 1000, "roleB_")
    write_encoded(spark, df2, out, n_parts=4, append=True)

    man = spark.read.parquet(f"{out}/manifest")
    assert man.agg({"part_id": "max"}).collect()[0][0] >= 4  # offset applied

    dicts = [r.asDict() for r in spark.read.parquet(f"{out}/dictionaries").collect()]
    role_rows = sorted((r for r in dicts if r["col_name"] == "role"),
                       key=lambda r: r["version"])
    assert role_rows[0]["is_delta"] is False
    assert any(r["is_delta"] for r in role_rows[1:]), "fresh roles must be deltas"
    # codes extend: base dictionary row unchanged
    assert role_rows[0]["n_values"] == 300

    dec = decode_dir(spark, out)
    # blocks from run 1 may be re-encoded only for NEW part ids; the decoded
    # union must equal df1 ∪ df2 exactly
    src = df1.unionByName(df2)
    rep = roundtrip_report(src, dec)
    assert rep["all_columns_identical"], rep
