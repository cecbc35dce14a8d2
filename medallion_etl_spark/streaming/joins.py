"""Watermarked stream-stream join — the Structured Streaming capability
the windowed aggs (windows.py) don't cover: correlating TWO live
streams with bounded state.

Semantics mirror the batch range-join query exactly (operators/
rangejoin.py::view_purchase_range_join — every purchase inside the
1-hour attention window opened by a same-user view), so the batch twin
is the correctness oracle: an availableNow drain over the same rows
must emit the identical match set (tests/test_stream_join.py).

Scale shape: Spark keeps BOTH sides' unmatched rows in the state
store; the two things that bound that state at 10^10-event scale are
exactly what this operator declares — a watermark on each side (how
late a row may arrive) and a time-range join condition (how long a
view can still match). With both present the engine evicts a buffered
view once `watermark > view_ts + horizon` and a buffered purchase once
`watermark > purchase_ts`, so state is O(events inside the
watermark+horizon span), not O(stream). Without the range condition a
stream-stream join must buffer one side forever — that is the failure
mode this module exists to avoid, and the eviction columns are plain
event-time columns so the join itself stays a shuffled equi-join on
user_id that AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HORIZON = "1 hour"


def view_purchase_stream_join(
    events: DataFrame, *, watermark: str | None = None
) -> DataFrame:
    """Inner join of the view and purchase sub-streams of ``events``:
    (view_id, purchase_id, user_id, gap_us) for every same-user
    purchase with ``view_ts <= purchase_ts < view_ts + 1 hour``.
    Works on batch frames too (watermarks are streaming-only).

    ``watermark`` is REQUIRED for streaming input, deliberately: it is
    the completeness/state trade and no default is safe — rows later
    than it are DROPPED, so the output matches the batch
    ``view_purchase_range_join`` only when the watermark covers the
    stream's actual disorder (a drop-free backfill over unordered
    files needs one wider than the data's whole time span; a live
    tail wants hours). test_stream_join.py pins both regimes."""
    if events.isStreaming and watermark is None:
        raise ValueError(
            "streaming input requires an explicit watermark= — it bounds "
            "join state by DROPPING rows later than this delay, so the "
            "right value is the stream's real disorder (no safe default)"
        )
    ev = events.withColumn("ts", F.col("ts").cast("timestamp"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    if events.isStreaming:
        views = views.withWatermark("view_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") < F.col("view_ts") + F.expr(f"INTERVAL {HORIZON}"))
    )
    return views.join(purchases, cond, "inner").select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )
