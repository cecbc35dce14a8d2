"""SCD Type-2 history from a CDC change stream: turn per-key change
events into a compressed dimension history (one row per distinct
attribute SPAN, with valid_from / valid_to / is_current), the standard
warehouse shape for "what was this key's attribute at time T" — the
reference's gold layer rebuilds dimensions from scratch per load
(/root/reference/src/layers/gold/aggregators/fact_ventas.py builds
dims by full re-aggregation); SCD2 is the incremental-history
re-expression of that surface.

Semantics over the driver's ``events`` stream: ``user_id`` keys the
dimension, ``event_type`` is the tracked attribute, ``event_id`` (the
LSN) orders changes, ``ts`` stamps them. ``event_type = 'error'`` is a
tombstone: it CLOSES the open span without opening one (the key has no
current row until its next non-tombstone change). Consecutive events
with the same attribute are compressed into one span — only change
points open rows, so history size is O(#changes), not O(#events).

Scale shape: ONE hash exchange on the dimension key feeds both window
passes — change-point detection (lag over the full stream, tombstones
included so attr -> tombstone -> same attr re-opens a span) and span
closing (lead over the surviving change points). Both windows share
partitioning and ordering so Catalyst reuses the sort; nothing ever
materializes on the driver and per-key state is a single sorted run,
exactly the plan a 100-TB dimension rebuild wants. Skewed keys are a
non-issue: windows are per-key sequential scans, and a key's history
is bounded by its own change count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

TOMBSTONE = "error"


def scd2_history(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    lsn_col: str,
    ts_col: str,
    tombstone: str | None = TOMBSTONE,
) -> DataFrame:
    """Compressed type-2 history of ``attr_col`` per ``key_col``.

    Returns (key, attr, valid_from, valid_to, version_seq,
    is_current): one row per span where the attribute held a constant
    value, ordered by ``lsn_col``; ``valid_to`` is the start of the
    next span (NULL while current); tombstone rows close spans but
    never appear as output rows.
    """
    order = Window.partitionBy(key_col).orderBy(lsn_col)
    prev = F.lag(attr_col).over(order)
    # change points: first event per key, or attribute differs from the
    # previous event (null-safe — tombstones participate so a value
    # re-appearing after a delete starts a NEW span).
    points = changes.withColumn(
        "_chg", prev.isNull() | ~prev.eqNullSafe(F.col(attr_col))
    ).filter(F.col("_chg"))
    closed = points.select(
        key_col,
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(order).alias("valid_to"),
        F.row_number().over(order).alias("version_seq"),
    )
    live = closed.filter(F.col("attr") != F.lit(tombstone)) if tombstone is not None else closed
    return live.withColumn(
        "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int")
    )


def scd2_user_type(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 history of each user's event_type over the events CDC
    stream (LSN = event_id, tombstone = 'error')."""
    ev = T(spark, sf, "events").filter(F.col("user_id").isNotNull())
    hist = scd2_history(ev, "user_id", "event_type", "event_id", "ts")
    return hist.select(
        "user_id",
        F.col("attr").alias("event_type"),
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        F.col("version_seq").cast("long").alias("version_seq"),
        "is_current",
    ).orderBy("user_id", "version_seq")


SCD2_USER_TYPE_SQL = f"""
WITH pts AS (
  SELECT user_id, event_type, event_id, ts,
         lag(event_type) OVER w AS prev_type
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
chg AS (
  SELECT user_id, event_type, event_id, ts
  FROM pts
  WHERE prev_type IS NULL OR prev_type IS DISTINCT FROM event_type
),
spans AS (
  SELECT user_id, event_type,
         CAST(ts AS TIMESTAMP) AS valid_from,
         CAST(lead(ts) OVER w AS TIMESTAMP) AS valid_to,
         CAST(row_number() OVER w AS BIGINT) AS version_seq
  FROM chg
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id, event_type, valid_from, valid_to, version_seq,
       CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM spans
WHERE event_type <> '{TOMBSTONE}'
ORDER BY user_id, version_seq
"""


QUERIES = {
    "scd2_user_type": (scd2_user_type, SCD2_USER_TYPE_SQL),
}
