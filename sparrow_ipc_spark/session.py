"""SparkSession factory tuned for the codec engine.

Design point is a 1000-executor cluster over ~100 TB; the sandbox runs
local[N] single-JVM. Everything scale-relevant is expressed through conf
(shuffle partitions, Arrow batch size, AQE skew handling) so the same code
ships unchanged via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The Arrow batch size is the direct analog of the reference's record-batch
# granularity (one IPC message per batch, serializer.hpp:36-263): every
# mapInPandas encode call sees one pa.RecordBatch of at most this many rows
# and emits exactly one encoded block row for it.
DEFAULT_ARROW_BATCH_ROWS = 65536


def get_spark(
    app_name: str = "sparrow-ipc-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch_rows: int = DEFAULT_ARROW_BATCH_ROWS,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # AQE: runtime coalescing + skew-split for long transcripts
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "268435456")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # NB: very large heaps (48g) trigger a GC pathology on this host —
        # wall time degrades monotonically across jobs; 8g is flat and fast
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Python Data Source zone-map pushdown (sources/datasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    return builder.getOrCreate()
