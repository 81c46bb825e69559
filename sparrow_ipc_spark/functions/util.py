"""Shared helpers for the operator family.

Two lessons (both measured on this repo's bench, round 6) shape every
hot operator here:

* **Driver-side expression construction is real wall time.**  Building a
  wide expression tree through the Python Column API costs one py4j round
  trip per operator/literal — the old 64-aggregate SimHash spent 3-7 s
  *constructing* its DataFrame before Spark saw a single row.  Hot
  operators therefore assemble their plans as generated SQL text (one
  ``spark.sql`` / ``selectExpr`` call), which parses JVM-side in
  milliseconds and yields the identical Catalyst plan.

* **A single-file parquet scan is one task.**  The bench tables are one
  row group, so Spark cannot split them and every per-row-heavy map stage
  (md5 per token, regex per doc, fold per vector) runs on ONE core.
  :func:`spread` round-robin-repartitions such a scan to the session's
  parallelism — and no-ops when the input already has enough partitions,
  so a real 100 TB table (thousands of splits) never pays the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition a too-coarse input so per-row-heavy stages
    use every core; no-op when the input already has ``min_parts``
    partitions (default: the session's default parallelism).

    The guide's "one huge unsplittable file" fix (§2.5), made adaptive:
    the exchange only exists when the scan is narrower than the machine,
    i.e. when the data is small enough that the exchange is trivially
    cheap.  Keyless round-robin keeps determinism under retries via
    Spark's sort-before-repartition default."""
    spark = df.sparkSession
    n = int(min_parts or spark.sparkContext.defaultParallelism)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def ident(name: str) -> str:
    """Backtick-quote an identifier for generated SQL."""
    return "`" + name.replace("`", "``") + "`"
