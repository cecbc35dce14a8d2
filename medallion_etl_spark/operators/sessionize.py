"""Batch sessionization: split each user's event stream into sessions
at inactivity gaps (the batch twin of streaming/windows.py's
``session_window`` aggregation — same semantics, applied to history).

Scale shape: one hash exchange on user_id feeding two window passes
(gap detection via lag, then a running sum assigning session ordinals)
that share the same partitioning+ordering — Spark plans a single
sort + exchange reused by both windows. The events' payload never
fans out; per-session rollup is an ordinary partial-aggregated
groupBy. This is the canonical gaps-and-islands plan and it survives
100× because nothing depends on the number of sessions or their
length — only on per-user event counts, which salting/AQE handle if a
user is pathologically hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60_000_000


def sessionize(df: DataFrame, user_col: str, ts_col: str, gap_us: int = _GAP_US) -> DataFrame:
    """Tag every row with ``session_seq`` (1-based per user): a new
    session starts when the gap to the previous event exceeds
    ``gap_us`` microseconds."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    order = Window.partitionBy(user_col).orderBy(us)
    is_new = (
        F.when(us - F.lag(us).over(order) > gap_us, 1)
        .otherwise(0)
        .cast("long")
    )
    run = Window.partitionBy(user_col).orderBy(us).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(run) + 1)


def user_sessions(spark: SparkSession, sf: str) -> DataFrame:
    """Per-session rollup of the events table: bounds, event count,
    value sum (decimal-accumulated) per (user, session)."""
    ev = sessionize(T(spark, sf, "events"), "user_id", "ts")
    return (
        ev.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


USER_SESSIONS_SQL = f"""
WITH gaps AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_GAP_US}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
),
tagged AS (
  SELECT user_id, ts, value,
         -- CAST matters: DuckDB's integer window sum returns HUGEINT,
         -- which pandas renders as float64 — the driver's value hash
         -- would then see 1.0 vs Spark's int64 1
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
              AS BIGINT) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM tagged
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


QUERIES = {
    "user_sessions": (user_sessions, USER_SESSIONS_SQL),
}
