"""Round-trip verification: decoded output must match source bit-identical
under stable (conv_id, turn_idx) ordering.

The Spark analog of the reference's raw-buffer / per-value comparison
(/root/reference/tests/test_de_serialization_with_files.cpp:226-264,
312-426), made distributed: per-column order-insensitive multiset hashes
(sum of xxhash64 over canonicalized values) plus a keyed join counting
per-turn text mismatches (the per-row invariant from BASELINE.json
``input_hint``).  No collect of data — only aggregated hashes reach the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(col: str, dtype: str):
    c = F.col(col)
    if dtype.startswith("timestamp"):
        # NTZ-safe: session tz is UTC, so the cast is exact
        c = F.unix_micros(c.cast("timestamp"))
    # null-safe: hash the value with a null marker so null vs '' differ
    return F.xxhash64(F.lit(col), c.cast("string"), F.isnull(c).cast("int"))


def column_fingerprints(df: DataFrame) -> dict:
    """Order-insensitive per-column multiset fingerprints + row count."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for f in df.schema.fields:
        # decimal(38,0) accumulator: overflow-free under ANSI mode at any scale
        aggs.append(
            F.sum(_canon(f.name, f.dataType.simpleString()).cast("decimal(38,0)")).alias(f"h_{f.name}")
        )
    return df.agg(*aggs).collect()[0].asDict()


def roundtrip_report(src: DataFrame, dec: DataFrame) -> dict:
    """Full fidelity report: counts, per-column hash equality, text-join check.

    Deliberately does NOT persist its inputs: the fingerprint pass and the
    text-join pass each re-run the decode plan, but decode is ~1 s at
    bench scale while caching 3.5M wide text rows costs ~8 s of
    serialization (measured — a persist() variant tripled verify wall).
    Recompute beats materialize for cheap-to-produce wide data."""
    fs, fd = column_fingerprints(src), column_fingerprints(dec)
    cols = [f.name for f in src.schema.fields]
    col_ok = {c: fs[f"h_{c}"] == fd[f"h_{c}"] for c in cols}
    # per-turn text equality under (conv_id, turn_idx) keys — shuffle the
    # 8-byte text hash, not the text itself (same verdict, ~40× less I/O).
    # GENERIC tables (the engine encodes arbitrary schemas) skip the keyed
    # check — the per-column multiset fingerprints above still cover every
    # column — instead of failing with UNRESOLVED_COLUMN.
    if {"conv_id", "turn_idx", "text"} <= set(cols):
        th = F.xxhash64(F.col("text"), F.isnull("text").cast("int"))
        text_mismatches = (
            src.select("conv_id", "turn_idx", th.alias("t_src"))
            .join(
                dec.select("conv_id", "turn_idx", th.alias("t_dec")),
                ["conv_id", "turn_idx"],
                "full_outer",
            )
            .where(~F.col("t_src").eqNullSafe(F.col("t_dec")))
            .count()
        )
    else:
        # skipped ≠ clean: None (plus the explicit flag) so a caller
        # auditing transcript-shaped data with a renamed column cannot
        # read an unrun check as a pass ("== 0" is False for None)
        text_mismatches = None
    return {
        "rows_src": fs["n_rows"],
        "rows_dec": fd["n_rows"],
        "columns_ok": col_ok,
        "all_columns_identical": all(col_ok.values()) and fs["n_rows"] == fd["n_rows"],
        "text_mismatches": text_mismatches,
        "text_check_skipped": text_mismatches is None,
    }
