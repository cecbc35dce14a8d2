"""Quarantine redrive: the remediation half of the malformed/violation
policy (cdc/quarantine.py wrote the rows; this re-applies them).

A diverted event is terminal at its ORIGINAL LSN — the committed batch
claimed its full planned range, so remediation means re-sending the
fixed rows at NEW LSNs (quarantine.py's docstring states the
contract; this module is its implementation). ``redrive_quarantine``
reads one quarantine dataset, applies a caller-supplied fix (a
DataFrame transform — e.g. patch ``op``, fill a key, correct a value
that violated a CHECK), re-validates with the SAME malformed gate the
replayers use, mints fresh LSNs at the table's high-water mark + 1,
and applies through ``apply_batch`` — so redriven rows ride LWW,
constraints, lineage, the change feed and time travel exactly like a
stream chunk. Rows the fix did not cure either fail the whole redrive
(default) or are dropped with a count — never silently re-applied and
never re-quarantined (a redrive loop that feeds itself is an outage,
not a policy).

Exactly-once: the batch id is STABLE — derived from the quarantine
dir's name XOR a content signature (bit_xor of per-row xxhash64), in
its own namespace carved from the top of the DML region
([3·2^37, 2^39); ``dml._DML_END`` was lowered to match, and no real
table's DML counter approaches 2^37 commits). Re-running the same
redrive after a crash-between-commit-and-cleanup finds the id already
in the manifest, skips the apply, and finishes the cleanup. If a
LATER replay window re-quarantines new rows into the same dir name,
the content signature changes and with it the batch id — the new rows
are not shadowed by the old commit. The residual hazard (commit
succeeded, cleanup failed, AND the dir was then rewritten so
previously-redriven rows are re-presented) re-upserts the same
payloads at higher LSNs: harmless unless an upstream event touched
the key in between, which is the same wins-over-concurrent-history
semantics DML has — finish the cleanup before opening new windows.

LWW placement: like DML, redriven rows are minted above the current
HWM, so they WIN against everything already applied and LOSE to any
newer upstream event that arrives later — remediation is an edit with
a position in the total order, not a retroactive patch.

Scale shape: quarantine datasets are bad-row-sized, so the one
global-order window that assigns row numbers (deterministic re-mint:
same content ⇒ same batch, whatever partition layout the dir was read
with) is a deliberate single-partition pass over a small frame; the
apply itself is the normal distributed merge path. No per-row Python.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .apply import apply_batch
from .quarantine import malformed_reason
from .table import LakeTable, retry_on_fork_rewind

REDRIVE_BASE = 3 << 37  # top half of the DML region; see dml._DML_END
REDRIVE_END = 1 << 39  # == manifest.RANGE_REFRESH_BASE
_ID_MASK = (1 << 37) - 1


def _batch_id(path: str, content_sig: int) -> int:
    dir_tag = int.from_bytes(
        hashlib.sha256(os.path.basename(os.path.normpath(path)).encode()).digest()[:8],
        "big",
    )
    return REDRIVE_BASE | ((dir_tag ^ content_sig) & _ID_MASK)


def redrive_quarantine(
    spark: SparkSession,
    table: LakeTable,
    quarantine_path: str,
    *,
    transform=None,
    on_still_bad: str = "fail",
    write_mode: str = "auto",
) -> dict:
    """Re-apply one quarantine dataset. ``transform(df) -> df`` is the
    fix (receives ``_reason``; its output needs the event columns);
    ``on_still_bad``: 'fail' (default — raise before anything applies)
    or 'drop' (apply the cured rows, count the rest). The dir is
    removed after a successful (or already-committed) apply."""
    if on_still_bad not in ("fail", "drop"):
        raise ValueError(f"on_still_bad must be 'fail' or 'drop', got {on_still_bad!r}")
    path = os.path.abspath(quarantine_path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"no quarantine dataset at {path}")
    raw = spark.read.parquet(path)
    if transform is not None:
        raw = transform(raw)
    events = raw.drop(*[c for c in ("_reason", "_chunk") if c in raw.columns])

    # one small agg: totals, still-bad count, and the content signature
    # over exactly the rows that would be applied (kept rows only, so
    # a 'drop' redrive and a fail-then-fix redrive of the same cured
    # set mint the same id)
    ev = events.withColumn("_rr", malformed_reason(table.key_col)).withColumn(
        "_h", F.xxhash64(*[F.col(c) for c in events.columns])
    )
    crow = ev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("_rr").alias("n_bad"),
        F.coalesce(
            F.expr("bit_xor(CASE WHEN _rr IS NULL THEN _h END)"), F.lit(0)
        ).alias("sig"),
    ).collect()[0]
    n_total, n_bad = int(crow["n_total"]), int(crow["n_bad"])
    n_keep = n_total - n_bad
    if n_bad and on_still_bad == "fail":
        raise ValueError(
            f"{n_bad} of {n_total} quarantined rows are still malformed "
            "after the transform: fix them (transform=) or pass "
            "on_still_bad='drop' — a redrive never re-quarantines"
        )
    if n_keep == 0:
        shutil.rmtree(path, ignore_errors=True)
        return {"redriven": 0, "still_bad_dropped": n_bad, "committed": False}

    batch_id = _batch_id(path, int(crow["sig"]))
    if batch_id in LakeTable.load(table.root).committed_batches():
        # crash-between-commit-and-cleanup resume: finish the cleanup
        shutil.rmtree(path, ignore_errors=True)
        return {
            "redriven": n_keep,
            "still_bad_dropped": n_bad,
            "committed": False,
            "already_committed": True,
            "batch_id": batch_id,
        }

    kept = ev.filter(F.col("_rr").isNull()).drop("_rr")
    key = table.key_col
    order = Window.orderBy(
        F.coalesce(F.col("lsn"), F.lit(-1)).asc(),
        F.col(key).cast("string").asc(),
        F.coalesce(F.col("op"), F.lit("")).asc(),
        F.col("_h").asc(),
    )

    t = table

    def _reload() -> None:
        nonlocal t
        t = LakeTable.load(t.root)

    def _apply() -> tuple[dict, int]:
        hwm = t.max_committed_lsn()
        redriven = kept.withColumn(
            "lsn", (F.lit(hwm) + F.row_number().over(order)).cast("long")
        ).drop("_h")
        res = apply_batch(
            spark,
            t,
            redriven,
            batch_id=batch_id,
            lsn_lo=hwm + 1,
            lsn_hi=hwm + n_keep,
            write_mode=write_mode,
        )
        return res, hwm

    res, hwm = retry_on_fork_rewind(_apply, _reload)
    shutil.rmtree(path, ignore_errors=True)
    return {
        "redriven": n_keep,
        "still_bad_dropped": n_bad,
        "committed": True,
        "batch_id": batch_id,
        "lsn_lo": hwm + 1,
        "lsn_hi": hwm + n_keep,
        "version": t.version,
    }
