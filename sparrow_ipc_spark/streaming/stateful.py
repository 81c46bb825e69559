"""Custom stateful streaming operators over the transcript stream.

The reference's streaming serializer keeps per-stream state (emitted
dictionaries, schema, end-of-stream flag — include/sparrow_ipc/
serializer.hpp:36-263); the Spark-native generalization is Structured
Streaming state:

* ``conversation_progress`` — ``applyInPandasWithState`` keyed on
  ``conv_id``: per-conversation running state (turn count, max turn_idx,
  last timestamp, distinct-role bitmap) updated per micro-batch.  This is
  the engine's "how complete is each conversation so far" operator — at
  10^12 turns the state store shards by conv_id across executors, no
  driver state.
* ``turns_per_window`` — event-time windowed aggregation with a watermark:
  late turns beyond the watermark are dropped, windows finalize
  incrementally (the standard late-data answer; no custom state needed).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = (
    "conv_id string, n_turns long, max_turn_idx int, last_ts_us long, role_mask int"
)
_STATE_SCHEMA = "n long, mx int, ts long, rm int"

_ROLE_BIT = {"user": 1, "assistant": 2, "system": 4, "tool": 8}


def _progress_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    n, mx, ts, rm = state.get if state.exists else (0, -1, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            # dropna first: an all-null column arrives as float64 NaNs and
            # int(NaN) would kill the streaming query
            tv = pdf["turn_idx"].dropna()
            if len(tv):
                mx = max(mx, int(tv.max()))
            sv = pdf["ts"].dropna()
            if len(sv):
                ts = max(ts, int(sv.astype("datetime64[us]").astype("int64").max()))
            for r in pdf["role"].dropna().unique():
                rm |= _ROLE_BIT.get(str(r), 0)
    state.update((n, mx, ts, rm))
    yield pd.DataFrame(
        [(conv_id, n, mx, ts, rm)],
        columns=["conv_id", "n_turns", "max_turn_idx", "last_ts_us", "role_mask"],
    )


def conversation_progress(stream_df: DataFrame) -> DataFrame:
    """Per-conversation running progress via ``applyInPandasWithState``.

    State shards by conv_id in the executor state store — the distributed
    analog of the reference serializer's per-stream dictionary tracker."""
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _progress_fn,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def turns_per_window(stream_df: DataFrame, window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Event-time turns-per-(window, role) with late-data handling: rows
    later than the watermark are dropped, windows finalize incrementally."""
    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                "role", "n_turns")
    )
