"""As-of (point-in-time) join — the operator Spark lacks natively.

For each left row, attach the newest right row with the same key whose
timestamp is <= the left row's timestamp (ties: right rows at the
exact left timestamp qualify). The classic use cases: trade-to-quote,
event-to-rate, SCD2 point-in-time lookup, click->purchase attribution.

Scale shape — union + carry-forward window, NOT a join: tag both
sides, union them, and run one window per key ordered by (ts, side,
tiebreak) carrying the last non-null right payload forward. Cost is a
SINGLE hash exchange on the key plus a per-partition sort — no join
node exists in the plan (pinned by test), so there is no candidate
explosion on hot keys and nothing quadratic anywhere: a key with L
left and R right rows costs (L+R) log(L+R) locally instead of the
L×R candidate pairs a range-join produces. This is the standard
distributed as-of formulation (Flink temporal join / kdb aj do the
same carry-forward under the hood).

Determinism: the window order is (ts, side, tiebreak) with an
explicit caller-supplied tiebreak column, so the carried row is a
pure function of the data — which is what lets the DuckDB oracle
(same window formulation) match hash-for-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join: every left row, plus the newest right row per
    ``keys`` with ``right_ts <= left_ts`` (NULL payload when none).

    ``payload``: right columns to carry (must not collide with left
    columns). ``tiebreak``: a right column ordering simultaneous right
    rows (the largest wins); left/right rows at the same timestamp
    sort right-first so equal timestamps qualify.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
    )
    # keys come from the right row; every other left column rides NULL
    r = right.select(
        *[
            (F.col(c) if c in keys else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *payload,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        *lcols,
        "_side",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def asof_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Attribution: each purchase event joined as-of to the same
    user's latest preceding (or simultaneous) click, with the gap in
    microseconds; purchases with no prior click keep NULLs."""
    ev = T(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts_src"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="purchase_ts",
        right_ts="click_ts_src",
        payload=["click_id", "click_ts"],
        tiebreak="click_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("click_ts").cast("timestamp"))
        ).alias("gap_us"),
    ).orderBy("purchase_id")


ASOF_ATTRIBUTION_SQL = """
WITH tagged AS (
  SELECT event_id AS purchase_id, user_id, ts AS _ts, 1 AS _side,
         CAST(NULL AS BIGINT) AS _tb,
         CAST(NULL AS BIGINT) AS click_id, CAST(NULL AS TIMESTAMP) AS click_ts
  FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT CAST(NULL AS BIGINT), user_id, ts, 0, event_id, event_id, ts
  FROM events WHERE event_type = 'click'
),
carried AS (
  SELECT purchase_id, user_id, _ts, _side,
         last_value(click_id IGNORE NULLS) OVER w AS click_id,
         last_value(click_ts IGNORE NULLS) OVER w AS click_ts
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY _ts, _side, _tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT purchase_id, user_id, _ts AS purchase_ts, click_id, click_ts,
       epoch_us(_ts) - epoch_us(click_ts) AS gap_us
FROM carried
WHERE _side = 1
ORDER BY purchase_id
"""


QUERIES = {
    "asof_attribution": (asof_attribution, ASOF_ATTRIBUTION_SQL),
}
