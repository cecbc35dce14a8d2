#!/usr/bin/env python
"""Subprocess worker for the multi-process OCC commit tests
(tests/test_multiprocess_occ.py).

Each invocation is ONE writer in its own OS process (own Python, own
JVM, own SparkSession): it loads a LakeTable handle FIRST (so the
handle can go stale while another process commits), signals readiness
through a sentinel file, optionally waits for a peer's sentinel, then
applies one batch and reports the outcome as a single ``RESULT:{json}``
line on stdout. The point of running this cross-process rather than
cross-thread is that ``metadata/COMMIT_LOCK`` flock semantics, fd
inheritance, and the rebase path's reload-from-disk are exercised the
way a real multi-writer deployment exercises them — per-PROCESS lock
ownership, no shared Python state, no shared JVM.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_etl_spark.cdc.apply import apply_batch  # noqa: E402
from medallion_etl_spark.cdc.table import LakeTable  # noqa: E402
from medallion_etl_spark.schemas import EVENTS_SCHEMA  # noqa: E402
from medallion_etl_spark.session import get_spark  # noqa: E402


def _wait_for(path: str, timeout: float = 300.0) -> None:
    deadline = time.time() + timeout
    while not os.path.exists(path):
        if time.time() > deadline:
            raise TimeoutError(f"sentinel never appeared: {path}")
        time.sleep(0.05)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--events", required=True)
    ap.add_argument("--filter", required=True, help="SQL predicate selecting this writer's chunk")
    ap.add_argument("--batch-id", type=int, required=True)
    ap.add_argument("--lsn-lo", type=int, required=True)
    ap.add_argument("--lsn-hi", type=int, required=True)
    ap.add_argument("--write-mode", default="cow", choices=["cow", "mor"])
    ap.add_argument("--allow-rebase", action="store_true")
    ap.add_argument("--touch", help="sentinel to create AFTER loading the table handle")
    ap.add_argument("--touch-done", help="sentinel to create after the apply commits")
    ap.add_argument("--wait-for", help="sentinel to wait for before applying")
    args = ap.parse_args()

    spark = get_spark(
        f"mp-occ-{args.batch_id}", parallelism=2, shuffle_partitions=4
    )
    # load the handle BEFORE signaling: the peer's commit makes it stale
    table = LakeTable.load(args.root)
    if args.touch:
        with open(args.touch, "w") as f:
            f.write(str(os.getpid()))
    if args.wait_for:
        _wait_for(args.wait_for)

    chunk = (
        spark.read.schema(EVENTS_SCHEMA).parquet(args.events).filter(args.filter)
    )
    try:
        res = apply_batch(
            spark,
            table,
            chunk,
            batch_id=args.batch_id,
            lsn_lo=args.lsn_lo,
            lsn_hi=args.lsn_hi,
            write_mode=args.write_mode,
            allow_rebase=args.allow_rebase,
        )
        out = {
            "ok": True,
            "commit_rebased": bool(res.get("commit_rebased")),
            "write_mode": res.get("write_mode"),
            "rows_applied": int(res.get("rows_applied", 0)),
        }
        if args.touch_done:
            with open(args.touch_done, "w") as f:
                f.write("done")
    except RuntimeError as exc:
        if "fork/rewind" not in str(exc):
            raise
        out = {"ok": False, "fork_rewind": True}
    print("RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
