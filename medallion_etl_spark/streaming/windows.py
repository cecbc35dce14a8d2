"""Streaming windowed aggregations with watermarks, plus a custom
stateful per-key operator via ``applyInPandasWithState``.

The reference is batch-only (cron); these are the Structured Streaming
operators the north_rule adds (SURVEY.md §2.9). Built-ins first:
tumbling ``window()`` and ``session_window()`` aggregations handle the
standard cases JVM-side; the Arrow-batched stateful operator exists
for semantics built-ins can't express (cross-batch running state per
key with custom emit logic) — state lives in Spark's state store,
checkpointed, and is Arrow-serialized pandas in user code, never
per-row Python over the wire.

Late data: ``withWatermark`` bounds state: rows later than the
watermark are dropped from aggregations — the classic watermark
tradeoff, in contrast to the CDC apply path where LWW-by-LSN makes
late arrivals order-insensitive instead (stream_replay.py).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.exprs import dsum


def windowed_event_counts(
    events: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type with a watermark
    bounding aggregation state. Works on batch frames too (window()
    is the same expression either way)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ sources
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(F.window("ts", window).alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sessionized_user_activity(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session extends while events arrive
    within ``gap`` of the previous one (built-in session_window)."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window("ts", gap).alias("s"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "sum_value"),
    ).select(
        F.col("s.start").alias("session_start"),
        F.col("s.end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


# --------------------------------------------------------------------------
# Custom stateful operator: per-user running totals across micro-batches.

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_event_id", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_id", T.LongType()),
    ]
)


def _update_running(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_id = state.get if state.exists else (0, 0.0, -1)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_id = max(last_id, int(pdf["event_id"].max()))
    state.update((n, total, last_id))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total], "last_event_id": [last_id]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Arrow-batched stateful operator: cumulative per-user totals that
    survive across micro-batches (and restarts, via the checkpointed
    state store). Emits the updated running row for every user seen in
    each batch — the streaming analog of an incrementally-maintained
    aggregate table."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
