#!/usr/bin/env python
"""Incremental-signature-maintenance probe: evidence that refreshing
the MinHash signature table from the change feed costs O(|changed
docs|), not O(|corpus|).

Shape: build a corpus LakeTable from a bootstrap change stream, then
commit a small tail (TAIL_PCT of the bootstrap volume). Measure:

- bootstrap refresh: signatures for the WHOLE corpus (the one-time
  full build — also the cost a non-incremental pipeline pays EVERY
  cycle);
- incremental refresh: the same operator fed only the feed span of the
  tail commit.

Both walls include the signature-table write and commit. The ratio is
the point: at 10^10 docs a daily 0.1% churn cycle pays ~0.1% of the
full-build cost (plus fixed job overhead, which dominates at this
sandbox scale and makes the measured ratio CONSERVATIVE).

Usage: python scripts/sig_refresh_probe.py [parallelism] [n_events] [tail_pct] [write_mode]
Prints one JSON line; writes BENCH/incremental_sig.json (latest run —
the curated evidence copies are BENCH/incremental_sig_<size>_<mode>.json).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else None


def main() -> None:
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    tail_pct = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    write_mode = sys.argv[4] if len(sys.argv) > 4 else "cow"

    from bench import _bench_conf
    from pyspark.sql import functions as F

    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.dedup_incremental import (
        create_signature_table,
        refresh_signatures,
    )
    from medallion_etl_spark.session import get_spark
    from medallion_etl_spark.synth import gen_events, write_events_ordered

    spark = get_spark(f"sig_probe_p{p}", parallelism=p, extra_conf=_bench_conf(p))
    tmp = tempfile.mkdtemp(prefix="sig_probe_", dir=SCRATCH)
    try:
        n_tail = max(int(n * tail_pct / 100.0), 1)
        ev_dir = os.path.join(tmp, "events")
        write_events_ordered(
            gen_events(spark, n_events=n + n_tail, n_keys=max(n // 5, 1)), ev_dir
        )
        events = spark.read.parquet(ev_dir)

        corpus = LakeTable.create(
            os.path.join(tmp, "corpus"), n_buckets=64, schema_version=2
        )
        replay(spark, events.filter(F.col("lsn") < n), corpus, chunk_size=n)
        corpus = LakeTable.load(corpus.root)
        v_boot = corpus.version

        sig = create_signature_table(os.path.join(tmp, "sig"), n_buckets=64)
        t0 = time.perf_counter()
        out_full = refresh_signatures(spark, corpus, sig, since_version=0)
        wall_full = time.perf_counter() - t0

        replay(spark, events, corpus, chunk_size=n)  # resume: the tail chunk
        corpus = LakeTable.load(corpus.root)
        sig = LakeTable.load(sig.root)
        t0 = time.perf_counter()
        out_inc = refresh_signatures(
            spark, corpus, sig, since_version=v_boot, write_mode=write_mode
        )
        wall_inc = time.perf_counter() - t0

        sig = LakeTable.load(sig.root)
        result = {
            "metric": "signature_refresh_wall",
            "unit": "sec",
            "parallelism": p,
            "bootstrap_events": n,
            "tail_events": n_tail,
            "tail_pct": tail_pct,
            "incremental_write_mode": write_mode,
            "corpus_docs": int(sig.detail()["stored_rows"] or 0),
            "bootstrap_rows_applied": int(out_full.get("rows_applied", 0)),
            "incremental_rows_applied": int(out_inc.get("rows_applied", 0)),
            "wall_bootstrap_sec": round(wall_full, 3),
            "wall_incremental_sec": round(wall_inc, 3),
            "speedup": round(wall_full / wall_inc, 2) if wall_inc else None,
        }
        print(json.dumps(result), flush=True)
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/incremental_sig.json", "w") as f:
            json.dump(result, f, indent=2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
