"""Regenerate the codec_selection literal oracle after a cost-model change.

Runs the query twice at the driver's correctness gate scale (sf0.01) on a
default-conf session, asserts run-to-run stability, and prints the VALUES
rows to paste into __spark_entry__._SQL["codec_selection"].
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as E

    spark = SparkSession.builder.master("local[4]").appName("gen-selection").getOrCreate()
    try:
        rows1 = sorted(tuple(r) for r in E._codec_selection(spark, sf_dir).collect())
        rows2 = sorted(tuple(r) for r in E._codec_selection(spark, sf_dir).collect())
        assert rows1 == rows2, "codec selection is not run-to-run stable!"
        print(", ".join(f"('{c}', '{k}', {n})" for c, k, n in rows1))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
