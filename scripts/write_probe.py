#!/usr/bin/env python
"""Probe: isolate the bucket-write phase of the merge job.

Runs the exact apply-path plan (storage layout -> fused max_by dedup ->
bucket column) twice: into the noop sink and into a partitionBy parquet
write, at the given parallelism. The delta is the write phase's wall;
comparing levels shows whether the write scales with cores or sits on
a fixed resource.

Usage: python scripts/write_probe.py [parallelism] [n_events]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_etl_spark.session import get_spark
from medallion_etl_spark.synth import gen_events, write_events_ordered

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
N_BUCKETS = 64


def main() -> None:
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
    spark = get_spark(
        f"write_probe_p{p}", parallelism=p,
        extra_conf={"spark.local.dir": os.path.join(SCRATCH, "spark-local")},
    )
    path = os.path.join(SCRATCH, "write_probe_events")
    ev = gen_events(spark, n, max(n // 10, 100))
    write_events_ordered(ev, path, n_files=32)
    events = spark.read.parquet(path)

    key = "doc_id"
    chunk = events.select(
        key, "tokens", "n_tok", "source", "lang",
        F.col("lsn").alias("_lsn"), (F.col("op") == "D").alias("_deleted"),
    ).withColumn("_ord", F.col("_lsn") * 2 + 1)
    payload = [c for c in chunk.columns if c != key]
    merged = (
        chunk.groupBy(key)
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), F.col("_ord")).alias("_l"))
        .select(key, *[F.col(f"_l.{c}").alias(c) for c in payload])
        .drop("_ord")
        .withColumn("_bucket", F.pmod(F.hash(F.col(key)), F.lit(N_BUCKETS)).cast("int"))
    )

    # JIT warm-up (both sinks)
    merged.limit(100_000).write.format("noop").mode("overwrite").save()
    out_dir = os.path.join(SCRATCH, "write_probe_out")
    shutil.rmtree(out_dir, ignore_errors=True)
    merged.limit(100_000).write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)

    results = {}
    t0 = time.perf_counter()
    merged.write.format("noop").mode("overwrite").save()
    results["noop_sec"] = round(time.perf_counter() - t0, 2)

    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
    results["parquet_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    merged.write.format("noop").mode("overwrite").save()
    results["noop2_sec"] = round(time.perf_counter() - t0, 2)

    results.update({"parallelism": p, "events": n})
    results["write_phase_sec"] = round(results["parquet_sec"] - min(results["noop_sec"], results["noop2_sec"]), 2)
    print(json.dumps(results))
    shutil.rmtree(out_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
