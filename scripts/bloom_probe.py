#!/usr/bin/env python
"""Probe: can a narrow-winners shuffle semi-join (with Spark's runtime
bloom filter dropping losers before the payload shuffle) beat the
max_by full-payload shuffle inside the merge job?

Rationale: in the 'agg' merge path every event's token payload crosses
the shuffle once (map-side partial agg collapses nothing when a key's
events are spread across input partitions). Winner selection only needs
(key, _ord); if a runtime bloom filter on the winner set reaches the
probe-side scan, ~90% of payload rows drop before shuffle serde — the
DRAM-heaviest phase at high parallelism shrinks ~an order of magnitude.

Usage: python scripts/bloom_probe.py [parallelism] [n_events]
Prints one JSON line per strategy.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from medallion_etl_spark.session import get_spark
from medallion_etl_spark.synth import gen_events, write_events_ordered

SCRATCH = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"


def main() -> None:
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    spark = get_spark(
        f"bloom_probe_p{p}",
        parallelism=p,
        extra_conf={
            "spark.local.dir": os.path.join(SCRATCH, "spark-local"),
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "512MB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1MB",
        },
    )
    path = os.path.join(SCRATCH, "bloom_probe_events")
    ev = gen_events(spark, n, max(n // 10, 100))
    write_events_ordered(ev, path, n_files=32)
    events = spark.read.parquet(path)

    combined = events.withColumn("_ord", F.col("lsn") * 2 + 1)
    key = "doc_id"

    def run(name, df):
        df.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        print(
            json.dumps(
                {
                    "strategy": name,
                    "parallelism": p,
                    "events": n,
                    "wall_sec": round(wall, 2),
                    "events_per_sec": round(n / wall, 1),
                    "bloom_in_plan": "bloom" in plan.lower(),
                    "shj_in_plan": "ShuffledHashJoin" in plan,
                }
            )
        )

    # A: current agg path (max_by full-payload shuffle)
    agg = combined.groupBy(key).agg(
        F.max_by(F.struct(*[c for c in combined.columns if c != key]), "_ord").alias("s")
    ).select(key, "s.*")
    run("max_by", agg)

    # B: narrow winners + shuffle semi-join (bloom-filter candidate)
    jk = F.coalesce(F.concat(F.lit("k"), F.col(key)), F.lit("n"))
    c2 = combined.withColumn("_jk", jk)
    winners = (
        c2.select("_jk", "_ord")
        .groupBy("_jk")
        .agg(F.max("_ord").alias("_w_ord"))
        .withColumnRenamed("_jk", "_w_jk")
    )
    semi = c2.join(
        winners.hint("shuffle_hash"),
        (F.col("_jk") == F.col("_w_jk")) & (F.col("_ord") == F.col("_w_ord")),
        "left_semi",
    ).drop("_jk").dropDuplicates([key]).drop("_ord")
    run("narrow_semi", semi)

    spark.stop()


if __name__ == "__main__":
    main()
