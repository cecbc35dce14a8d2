#!/usr/bin/env python
"""Decomposition probe for the scaling measurement: runs (a) a pure
CPU-bound aggregation and (b) a data-heavy parquet write at two
parallelism levels, fresh JVM per run, and prints per-phase scaling.

Purpose: on a single box the memory subsystem is SHARED — phases that
stream GBs (parquet encode/decode, shuffle serialization) saturate
DRAM bandwidth at a handful of cores and stop scaling, while pure
compute scales ~linearly. On a real cluster each executor node brings
its own memory bandwidth, so the data-heavy phases scale with nodes
the way pure compute scales with cores here. This probe makes that
decomposition measurable instead of asserted.

    python scripts/scaling_probe.py --lo 2 --hi 8
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _probe(parallelism: int) -> None:
    from pyspark.sql import functions as F

    from medallion_etl_spark.session import get_spark
    from medallion_etl_spark.synth import gen_events, write_events_ordered

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    conf = {"spark.local.dir": os.path.join(scratch, "spark-local")} if scratch else {}
    # cap GC threads at 8 like bench._bench_conf: uncapped at --hi 32
    # the probe would measure the GC thread storm, not the memory wall
    gc_threads = max(min(parallelism, 8), 2)
    conf["spark.driver.extraJavaOptions"] = (
        f"-XX:ParallelGCThreads={gc_threads} -XX:ConcGCThreads={max(gc_threads // 4, 1)}"
    )
    spark = get_spark(f"probe_{parallelism}", parallelism=parallelism, extra_conf=conf)

    # warm-up (codegen JIT)
    spark.range(0, 1_000_000, 1, 8).select(F.sum(F.xxhash64("id") % 1000)).collect()

    # (a) pure compute: 16 chained hashes over 200M longs, no data moved
    expr = F.col("id")
    for _ in range(16):
        expr = F.xxhash64(expr)
    t0 = time.perf_counter()
    spark.range(0, 200_000_000, 1, 64).select(F.sum(F.pmod(expr, F.lit(1000)))).collect()
    compute_sec = time.perf_counter() - t0

    # (b) data-heavy: generate + parquet-write 8M token-array events
    tmp = tempfile.mkdtemp(dir=scratch)
    t0 = time.perf_counter()
    write_events_ordered(gen_events(spark, 8_000_000, 800_000), f"{tmp}/ev", n_files=32)
    write_sec = time.perf_counter() - t0
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"parallelism": parallelism, "compute_sec": round(compute_sec, 2),
                      "write_sec": round(write_sec, 2)}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--hi", type=int, default=8)
    ap.add_argument("--probe", type=int, help="internal: run one level")
    args = ap.parse_args()
    if args.probe:
        _probe(args.probe)
        return
    out = {}
    for p in (args.lo, args.hi):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", str(p)],
            capture_output=True, text=True, check=True,
        )
        out[p] = json.loads(proc.stdout.strip().splitlines()[-1])
    ratio = args.hi / args.lo
    result = {
        "levels": {str(k): v for k, v in out.items()},
        "compute_scaling_efficiency": round(
            (out[args.lo]["compute_sec"] / out[args.hi]["compute_sec"]) / ratio, 3
        ),
        "write_scaling_efficiency": round(
            (out[args.lo]["write_sec"] / out[args.hi]["write_sec"]) / ratio, 3
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling_probe.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
