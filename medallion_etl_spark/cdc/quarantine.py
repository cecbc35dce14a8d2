"""Malformed change-event policy for the replayers.

A change event is malformed when it cannot participate in the LWW
merge at all:

- ``null_lsn`` — no position in the total order, so "last writer"
  is undefined for it;
- ``null_key`` — no merge identity (a NULL key row can be stored, but
  a CHANGE event without a key cannot name what it changes);
- ``bad_op``  — op outside {I, U, D}. Without a gate these silently
  fall into the "not a delete" branch and UPSERT garbage.

The reference trusts its extract layer (requests + psycopg2 executemany
against typed DDL, e.g. reference etl/extract/extract_sql.py) to reject
bad rows before load; a WAL/binlog tail has no such gatekeeper, so the
replayer owns the policy (Spark's badRecordsPath / Delta constraint
analog):

- ``fail`` (default): raise before ANYTHING is applied. The check
  rides the replay's existing upfront stats aggregation — zero extra
  jobs on the clean path.
- ``quarantine``: write bad rows (+ ``_reason``) to a deterministic
  dir under the table root, replay the rest. Overwrite-by-range keeps
  redelivery idempotent.
- ``drop``: replay the rest, report the dropped count.

All paths are pure column expressions — no per-row Python.

Terminality: a diverted (quarantined/dropped) event is PROCESSED at
its LSN — the committed batch claims its full planned range, because
redelivery idempotence requires re-presenting the identical range.
Remediation therefore means re-sending the fixed event at a NEW LSN;
a re-send at the original LSN is a manifest no-op for replay and sits
at or below every later change-feed watermark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_OPS = ("I", "U", "D")
POLICIES = ("fail", "quarantine", "drop")


def malformed_reason(key_col: str) -> Column:
    """NULL iff the event is well-formed, else the first failing
    reason. Total: a NULL op yields 'bad_op', never a NULL boolean
    (``isin`` on NULL is NULL, which a bare filter would drop
    silently — exactly the bug this module exists to prevent)."""
    return (
        F.when(F.col("lsn").isNull(), F.lit("null_lsn"))
        .when(F.col(key_col).isNull(), F.lit("null_key"))
        .when(
            ~F.coalesce(F.col("op").isin(*VALID_OPS), F.lit(False)),
            F.lit("bad_op"),
        )
    )


def split_malformed(events: DataFrame, key_col: str) -> tuple[DataFrame, DataFrame]:
    """(clean, malformed-with-``_reason``) — one tagging expression so
    the two frames can never disagree about a row."""
    reason = malformed_reason(key_col)
    return (
        events.filter(reason.isNull()),
        events.withColumn("_reason", reason).filter(F.col("_reason").isNotNull()),
    )
