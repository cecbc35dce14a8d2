"""Flagship query: a full CDC replay through the engine, oracle-checked.

Interprets the driver's ``events`` table as a change stream —
``event_id`` is the LSN, ``user_id`` keys the doc, ``event_type =
'error'`` means delete — builds token payloads deterministically from
the row values, replays it chunked through the LakeTable (LWW dedup ->
salted merge -> manifest commit), and returns the final table state.
The DuckDB oracle expresses the same semantics as one window query, so
the driver's correctness gate exercises the ENTIRE engine spine:
scan -> shuffle -> window/agg -> merge -> atomic commit -> read back.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cdc.replay import replay
from ..cdc.table import LakeTable
from ..sources.readers import load_table as T


def _as_change_stream(ev: DataFrame) -> DataFrame:
    is_del = F.col("event_type") == "error"
    tok0 = F.floor(F.col("value") * 100).cast("int")
    tokens = F.array(tok0, F.col("user_id").cast("int"), F.col("event_id").cast("int"))
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.concat(F.lit("u"), F.col("user_id")).alias("doc_id"),
        F.when(is_del, F.lit(None)).otherwise(tokens).alias("tokens"),
        F.when(is_del, F.lit(None)).otherwise(F.lit(3).cast("long")).alias("n_tok"),
        F.when(is_del, F.lit(None)).otherwise(F.col("event_type")).alias("source"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(2).alias("schema_version"),
    )


def cdc_replay_latest_state(spark: SparkSession, sf: str) -> DataFrame:
    events = T(spark, sf, "events")
    stream = _as_change_stream(events)
    n = events.agg(F.max("event_id")).collect()[0][0] or 0
    chunk = max(int(n) // 4, 1)

    # Session-lifetime table dir (deterministic per input, fresh per
    # call, atexit-cleaned): the returned DataFrame stays a LAZY read
    # over the replayed table — no toPandas round-trip, so the flagship
    # never materializes the full final state on the driver (at real
    # scale that would be a driver-memory bottleneck).
    tmp = os.path.join(
        tempfile.gettempdir(),
        f"cdc_flagship_{hashlib.md5(sf.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(tmp, ignore_errors=True)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    root = f"{tmp}/t"
    table = LakeTable.create(root, n_buckets=8, schema_version=2)
    # merge_path="agg" so the driver's correctness gate exercises
    # the explicitly-salted shuffle dedup (auto would pick the
    # broadcast path on a stream this small)
    replay(
        spark, stream, table, chunk_size=chunk,
        dedup_strategy="salted", merge_path="agg",
    )
    final = LakeTable.load(root).read(spark)
    return final.select(
        "doc_id",
        F.element_at("tokens", 1).alias("tok_value"),
        F.element_at("tokens", 2).alias("tok_user"),
        F.element_at("tokens", 3).alias("last_lsn"),
        "n_tok",
        F.col("source").alias("last_type"),
    ).orderBy("doc_id")


CDC_REPLAY_LATEST_STATE_SQL = """
SELECT concat('u', user_id) AS doc_id,
       CAST(FLOOR(value * 100) AS INT) AS tok_value,
       CAST(user_id AS INT) AS tok_user,
       CAST(event_id AS INT) AS last_lsn,
       CAST(3 AS INTEGER) AS n_tok,
       event_type AS last_type
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1
  AND event_type <> 'error'
ORDER BY doc_id
"""


QUERIES = {
    "cdc_replay_latest_state": (cdc_replay_latest_state, CDC_REPLAY_LATEST_STATE_SQL),
}
