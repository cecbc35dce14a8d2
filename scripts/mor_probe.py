#!/usr/bin/env python
"""Probe: copy-on-write vs merge-on-read write amplification.

Workload = the MOR design target: a stream of SMALL update chunks over
a LARGE established base (every chunk touches every bucket, so COW
rewrites ~the whole table per chunk while MOR appends ~|chunk| rows).
Bootstraps the base once (always COW), then replays K incremental
chunks under the given write_mode, and reports:

- incremental wall + events/s (the write-side win)
- bytes written during the incremental phase (lineage bytes — the
  write-amplification factor itself)
- post-incremental full-scan wall (the read tax MOR pays before a
  compaction folds its deltas) and post-compaction scan wall

One process per mode (same reason as scaling_probe.py: page cache and
JIT state must not leak between the configs being compared):

    python scripts/mor_probe.py cow [parallelism]
    python scripts/mor_probe.py mor [parallelism]

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_etl_spark.cdc.apply import apply_batch  # noqa: E402
from medallion_etl_spark.cdc.lineage import read_lineage  # noqa: E402
from medallion_etl_spark.cdc.replay import replay  # noqa: E402
from medallion_etl_spark.cdc.table import LakeTable  # noqa: E402
from medallion_etl_spark.session import get_spark  # noqa: E402
from medallion_etl_spark.synth import gen_events, write_events_ordered  # noqa: E402

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
N_BUCKETS = 64
N_KEYS = 2_000_000
BOOTSTRAP_EVENTS = 3_000_000
CHUNK_EVENTS = 50_000
N_CHUNKS = 8


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "mor"
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(
        f"mor_probe_{mode}_p{p}", parallelism=p,
        extra_conf={"spark.local.dir": os.path.join(SCRATCH, "spark-local")},
    )
    total = BOOTSTRAP_EVENTS + N_CHUNKS * CHUNK_EVENTS
    # gen_events is seeded, so both modes read the SAME dataset; keying the
    # path by the workload params keeps a stale dir from an older
    # parameterization from silently skewing one side of the comparison
    path = os.path.join(SCRATCH, f"mor_probe_events_{total}_{N_KEYS}")
    # key the reuse check on _SUCCESS, not the dir: a crashed (or
    # concurrently starting) writer leaves a partial dir that a bare
    # exists() would read as the full stream, silently skewing one
    # side of the cow/mor comparison
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        write_events_ordered(gen_events(spark, total, N_KEYS), path, n_files=32)
    events = spark.read.parquet(path)

    root = os.path.join(SCRATCH, f"mor_probe_table_{mode}")
    shutil.rmtree(root, ignore_errors=True)
    table = LakeTable.create(root, n_buckets=N_BUCKETS)
    # bootstrap id lives outside the incremental replay's small-int
    # chunk namespace (batch-id collision guard would reject it)
    apply_batch(
        spark,
        table,
        events.filter(F.col("lsn") < BOOTSTRAP_EVENTS),
        batch_id=1 << 38,
        lsn_lo=0,
        lsn_hi=BOOTSTRAP_EVENTS - 1,
        write_mode="cow",
    )

    inc = events.filter(F.col("lsn") >= BOOTSTRAP_EVENTS)
    t0 = time.perf_counter()
    replay(
        spark, inc, LakeTable.load(root), chunk_size=CHUNK_EVENTS, write_mode=mode
    )
    inc_wall = time.perf_counter() - t0
    inc_events = N_CHUNKS * CHUNK_EVENTS

    lineage = read_lineage(spark, root)
    inc_bytes = int(
        lineage.filter(F.col("batch_id") < (1 << 38))
        .agg(F.sum("bytes_written"))
        .collect()[0][0]
    )

    table = LakeTable.load(root)
    t0 = time.perf_counter()
    pre_compact_count = table.read(spark).count()
    scan_with_deltas = time.perf_counter() - t0

    t0 = time.perf_counter()
    table.compact(spark, watermark_lsn=total)
    compact_wall = time.perf_counter() - t0
    table = LakeTable.load(root)
    t0 = time.perf_counter()
    post_compact_count = table.read(spark).count()
    scan_after_compact = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "mode": mode,
                "parallelism": p,
                "n_keys": N_KEYS,
                "bootstrap_events": BOOTSTRAP_EVENTS,
                "inc_chunks": N_CHUNKS,
                "chunk_events": CHUNK_EVENTS,
                "inc_wall_sec": round(inc_wall, 2),
                "inc_events_per_sec": round(inc_events / inc_wall),
                "inc_bytes_written": inc_bytes,
                "bytes_per_event": round(inc_bytes / inc_events, 1),
                "scan_with_deltas_sec": round(scan_with_deltas, 2),
                "compact_sec": round(compact_wall, 2),
                "scan_after_compact_sec": round(scan_after_compact, 2),
                "rows": pre_compact_count,
                "rows_after_compact": post_compact_count,
            }
        )
    )


if __name__ == "__main__":
    main()
