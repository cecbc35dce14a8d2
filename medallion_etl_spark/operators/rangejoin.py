"""Range (interval) join — the other operator Spark plans badly.

Match every left point to the right intervals containing it
(``keys`` equal AND ``start <= point < end``). Spark's own planner
turns a pure range predicate into BroadcastNestedLoopJoin — O(L×R)
compares — and even the keyed form evaluates the range residually
against every same-key pair, which melts down on hot keys.

Scale shape — grain bucketing (the Databricks range-join-hint /
interval-tree trick, expressed in plain DataFrame ops): pick a time
grain, explode each interval into the grain cells it overlaps, map
each point to its single cell, and equi-join on (keys, cell). The
range predicate then runs only on candidates that already share a
cell. A point lives in exactly ONE cell, so every (point, interval)
match is produced exactly once — no dedup pass. Cost: the interval
side inflates by ceil(len/grain) rows (choose grain ≈ the typical
interval length so that factor is ~1-2), and the join is a plain
shuffled equi-join Catalyst/AQE can plan, skew-handle, and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table as T


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_col: str,
    start_col: str,
    end_col: str,
    grain: int,
) -> DataFrame:
    """Inner range join on numeric columns: rows (p ⨝ i) with equal
    ``keys`` and ``start <= point < end`` (half-open). ``grain`` is in
    the columns' own units; non-key column names must not collide."""
    cell = F.explode(
        F.sequence(
            F.floor(F.col(start_col) / grain),
            F.floor((F.col(end_col) - 1) / grain),
        )
    ).alias("_cell")
    i = intervals.select("*", cell)
    p = points.withColumn("_cell", F.floor(F.col(point_col) / grain))
    return (
        p.join(i, [*keys, "_cell"])
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("_cell")
    )


_HOUR_US = 3_600_000_000


def view_purchase_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Every purchase inside the 1-hour attention window opened by a
    same-user view: (view_id, purchase_id, user_id, gap_us). Grain =
    the window length, so each interval explodes into <=2 cells."""
    ev = T(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        us.alias("w_start"),
        (us + _HOUR_US).alias("w_end"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", us.alias("p_us")
    )
    out = range_join(
        purchases, views, keys=["user_id"], point_col="p_us",
        start_col="w_start", end_col="w_end", grain=_HOUR_US,
    )
    return out.select(
        "view_id",
        "purchase_id",
        "user_id",
        (F.col("p_us") - F.col("w_start")).alias("gap_us"),
    ).orderBy("view_id", "purchase_id")


VIEW_PURCHASE_RANGE_JOIN_SQL = """
SELECT v.event_id AS view_id,
       p.event_id AS purchase_id,
       v.user_id,
       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND p.ts >= v.ts
 AND p.ts < v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY view_id, purchase_id
"""


QUERIES = {
    "view_purchase_range_join": (view_purchase_range_join, VIEW_PURCHASE_RANGE_JOIN_SQL),
}
