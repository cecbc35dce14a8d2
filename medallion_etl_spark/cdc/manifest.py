"""Commit manifest accessors — the exactly-once ledger.

The manifest itself lives INSIDE the LakeTable metadata document (see
table.py) so that "data visible" and "batch recorded" change in one
atomic pointer swap; this module exposes it as a DataFrame and as
replay-planning helpers.

Exactly-once invariant: a batch is applied iff its batch_id is in the
manifest; apply_batch() no-ops on committed ids; a kill between data
write and commit leaves the id absent, so resume re-applies — and the
apply is deterministic (same chunk -> same logical result), so the
final state is independent of how many times replay was killed and
resumed. This is the engineered version of the reference's idempotent
delete+insert-by-range convergence (reference sales_loader.py:64-73,
orchestrator.py:480-509) without its BUG-001 visibility window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import MANIFEST_SCHEMA
from .table import LakeTable

# Batch-id namespace boundaries (the ONE definition — orchestrator
# REFRESH_BASE, dml's _DML_END, redrive's namespace and ivm's cursor
# filter all import them): ids below 2^38 are replay chunks (small
# ints); [2^38, 3·2^37) is the DML counter; [3·2^37, 2^39) is
# quarantine redrives (hash-stable, cdc/redrive.py); at/above are
# LSN-range refreshes (2^39+) and streaming epochs (2^40+). A derived
# table's version cursor = max committed id BELOW RANGE_REFRESH_BASE.
RANGE_REFRESH_BASE = 1 << 39
REDRIVE_BASE = 3 << 37


def manifest_df(spark: SparkSession, table: LakeTable) -> DataFrame:
    rows = [
        (bid, rec["lsn_lo"], rec["lsn_hi"], "committed", None)
        for bid, rec in sorted(table.committed_batches().items())
    ]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


def pending_chunks(table: LakeTable, chunks: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """Filter a planned (batch_id, lsn_lo, lsn_hi) chunk list down to
    the ones not yet committed.

    A committed id is only skippable when its recorded LSN range equals
    the planned one (a true redelivery). A mismatch means the caller is
    replaying a DIFFERENT window of the stream — e.g. feeding only
    today's tail, so lsn_min moved and chunk 0 now names new data —
    and skipping would silently drop events. Same guard as apply_batch,
    enforced here because this filter would otherwise hide those
    chunks from it. (Fix for the silent variant of reference BUG-001's
    visibility class: resume must never lose data, loudly or quietly.)
    """
    committed = table.committed_batches()
    todo = []
    for bid, lo, hi in chunks:
        rec = committed.get(bid)
        if rec is not None:
            if (int(rec["lsn_lo"]), int(rec["lsn_hi"])) != (lo, hi):
                raise RuntimeError(
                    f"batch_id {bid} already committed for LSN range "
                    f"[{rec['lsn_lo']}, {rec['lsn_hi']}] but this replay plans "
                    f"[{lo}, {hi}] for it: the stream window moved, "
                    "chunk_size changed, or the stream GREW past a committed "
                    "partial final chunk — skipping would silently drop "
                    "events. Recovery: replay only the NEW events as an "
                    "LSN-range partial refresh (scripts/orchestrator.py "
                    "partial-refresh — own batch-id namespace, idempotent, "
                    f"start it at LSN {int(rec['lsn_hi']) + 1}), or use the "
                    "streaming replayer for a continuously moving tail."
                )
            continue
        todo.append((bid, lo, hi))
    return todo


def plan_chunks(lsn_min: int, lsn_max: int, chunk_size: int) -> list[tuple[int, int, int]]:
    """Deterministic chunk plan: batch_id i covers lsn in
    [lsn_min + i*chunk_size, next) — stable across resumes because it
    depends only on the stream bounds and chunk size."""
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    chunks = []
    i = 0
    lo = lsn_min
    while lo <= lsn_max:
        hi = min(lo + chunk_size - 1, lsn_max)
        chunks.append((i, lo, hi))
        lo = hi + 1
        i += 1
    return chunks
