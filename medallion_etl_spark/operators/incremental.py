"""Incremental gold-aggregate maintenance from the change feed.

The reference recomputes every gold table from silver on each load
(fact_ventas.py, cobertura.py — full DELETE + re-INSERT per range).
With a preimage change feed (cdc/table.py `read_changes(...,
include_preimage=True)`), a distributive aggregate (SUM / COUNT) can
instead be maintained by DELTA: add each upserted row's contribution,
subtract each replaced/deleted row's old contribution. Cost per
refresh is O(|changed rows| + |gold|), never O(|fact table|) — at
100 TB this is the difference between touching gigabytes and
re-scanning the lake.

Delta math (per group):
    new_agg = old_agg + Σ(postimage) − Σ(preimage)
where postimages are the feed's 'upsert' rows and preimages are the
'update_preimage' rows (a delete contributes only its preimage;
a fresh insert only its postimage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.table import LakeTable

def _sign() -> F.Column:
    # 'delete' tombstones weigh 0: their preimage row carries the subtraction
    return (
        F.when(F.col("_change_type") == "upsert", F.lit(1))
        .when(F.col("_change_type") == "update_preimage", F.lit(-1))
        .otherwise(F.lit(0))
    )


def aggregate_snapshot(df: DataFrame, group_cols: list[str], measures: dict[str, str]) -> DataFrame:
    """Full recompute of the gold aggregate from a snapshot read —
    the bootstrap (and the property-test oracle) for the delta path.
    Each measure carries a ``_nn_<name>`` non-null contribution count
    in the maintained state: SQL's SUM over zero non-null inputs is
    NULL, and only that count can tell an all-NULL group (sum NULL)
    apart from one whose contributions cancel to 0."""
    aggs = [F.sum(F.expr(expr)).alias(name) for name, expr in measures.items()]
    aggs += [
        F.count(F.expr(expr)).alias(f"_nn_{name}") for name, expr in measures.items()
    ]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*group_cols).agg(*aggs)


def aggregate_delta(feed: DataFrame, group_cols: list[str], measures: dict[str, str]) -> DataFrame:
    """The per-group delta implied by a preimage change feed."""
    sign = _sign()
    aggs = [
        F.sum(F.expr(expr) * sign).alias(name) for name, expr in measures.items()
    ]
    aggs += [
        F.sum(F.when(F.expr(expr).isNotNull(), sign).otherwise(F.lit(0))).alias(
            f"_nn_{name}"
        )
        for name, expr in measures.items()
    ]
    aggs.append(F.sum(sign).alias("n_rows"))
    return feed.groupBy(*group_cols).agg(*aggs)


def apply_delta(gold: DataFrame, delta: DataFrame, group_cols: list[str], measures: dict[str, str]) -> DataFrame:
    """gold ⊕ delta by group key (full outer: new groups appear, and
    groups whose row count reaches zero disappear). NULL-safe on the
    group key so NULL-group aggregates merge rather than duplicate.
    A measure whose merged non-null count reaches zero comes out NULL,
    not 0 — the delta-maintenance ≡ recompute contract includes NULL
    sums."""
    plain = [f"_nn_{m}" for m in measures] + ["n_rows"]
    cols = [*measures.keys(), *plain]
    d = delta.select(
        *[F.col(c).alias(f"_d_{c}") for c in group_cols],
        *[F.col(c).alias(f"_dv_{c}") for c in cols],
    )
    cond = None
    for c in group_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_d_{c}"))
        cond = clause if cond is None else (cond & clause)
    merged = gold.join(d, cond, "full_outer")

    def _add(c: str) -> F.Column:
        return F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"_dv_{c}"), F.lit(0))

    out_cols = (
        [F.coalesce(F.col(c), F.col(f"_d_{c}")).alias(c) for c in group_cols]
        + [F.when(_add(f"_nn_{m}") > 0, _add(m)).alias(m) for m in measures]
        + [_add(c).alias(c) for c in plain]
    )
    return merged.select(*out_cols).filter(F.col("n_rows") > 0)


def maintain_gold(
    spark: SparkSession,
    table: LakeTable,
    since_version: int,
    gold: DataFrame,
    group_cols: list[str],
    measures: dict[str, str],
) -> DataFrame:
    """One incremental refresh: gold-as-of-``since_version`` plus the
    feed delta up to the table's current version."""
    feed = table.read_changes(spark, since_version, include_preimage=True)
    return apply_delta(gold, aggregate_delta(feed, group_cols, measures), group_cols, measures)


# ---- oracle-paired driver query -----------------------------------------


def incremental_gold_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Gold aggregate (token volume by source) maintained INCREMENTALLY:
    bootstrap from the half-stream snapshot, then apply only the
    second half's feed delta — never recomputing from the full fact.
    The oracle recomputes the same aggregate from the events' final
    LWW state, so a green row proves delta maintenance ≡ recompute."""
    from .cdc_query import _feed_table_root

    root = _feed_table_root(spark, sf)
    table = LakeTable.load(root)
    measures = {"sum_n_tok": "n_tok", "sum_tok0": "tokens[0]"}
    snap = LakeTable.load_version(root, 1)
    gold_v1 = aggregate_snapshot(snap.read(spark), ["source"], measures)
    out = maintain_gold(spark, table, 1, gold_v1, ["source"], measures)
    return out.select(
        "source",
        F.col("sum_n_tok").cast("long").alias("sum_n_tok"),
        F.col("sum_tok0").cast("long").alias("sum_tok0"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("source")


INCREMENTAL_GOLD_BY_SOURCE_SQL = """
WITH latest AS (
  SELECT user_id,
         arg_max(event_type, event_id) AS event_type,
         arg_max(value, event_id) AS value
  FROM events GROUP BY user_id
), live AS (
  SELECT event_type AS source,
         CAST(FLOOR(value * 100) AS INT) AS tok0
  FROM latest WHERE event_type <> 'error'
)
SELECT source,
       CAST(SUM(3) AS BIGINT) AS sum_n_tok,
       CAST(SUM(tok0) AS BIGINT) AS sum_tok0,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM live
GROUP BY source
ORDER BY source
"""


QUERIES = {
    "incremental_gold_by_source": (
        incremental_gold_by_source,
        INCREMENTAL_GOLD_BY_SOURCE_SQL,
    ),
}
