"""SparkSession factory.

Single place where every job (tests, bench, replay driver, driver
contract) builds its session, so the scale-relevant knobs are set
uniformly:

- AQE on (runtime coalescing + skew-join splitting),
- shuffle partitions sized to parallelism (not the 200 default),
- Arrow on (all pandas-UDF paths are vectorized),
- session timezone pinned to UTC so results hash identically against
  the DuckDB oracle (duckdb timestamps are UTC-naive).

On a real cluster the same code runs under ``spark-submit --py-files``;
only ``master`` / executor sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_PARALLELISM = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "medallion_etl_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``parallelism`` maps to ``local[N]`` in the sandbox; under
    spark-submit the master URL comes from the submit args and this
    function deliberately does NOT call ``.master()`` (see below).
    """
    n = parallelism or DEFAULT_PARALLELISM
    shuffle = shuffle_partitions or max(n, 8)
    # Under spark-submit the JVM gateway already exists (PythonRunner
    # exports PYSPARK_GATEWAY_PORT) and the master/driver sizing came
    # from the submit args. An unconditional .master() here would
    # silently OVERRIDE `spark-submit --master <cluster>` back to
    # local[n] — the job would "run" but never leave the driver. Gate
    # every launch-time conf so the same code deploys unchanged at any
    # cluster size (north rule; exercised by tests/test_spark_submit.py).
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # zstd shuffle/broadcast codec: trades CPU (which scales with
        # cores) for bytes moved (which hit the DRAM-bandwidth ceiling
        # first on shuffle-heavy plans). Measured on the CDC replay:
        # +80-90% throughput at local[8] and ~8x lower run-to-run
        # variance vs lz4 (BENCH/BASELINE.md).
        .config("spark.io.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if not under_submit:
        builder = (
            builder.master(f"local[{n}]")
            .config(
                "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
            )
            # JVM ergonomics size GC threads to the HOST's cores (23 on
            # the 32-core sandbox); with local[32] task threads that is
            # a 60+ thread storm that collapses throughput ~4x on
            # agg-heavy plans. Cap parallel GC; only effective when this
            # session launches the JVM (first getOrCreate in the
            # process). Under spark-submit, pass the equivalents as
            # --driver-memory / --conf on the submit line.
            .config(
                "spark.driver.extraJavaOptions",
                "-XX:ParallelGCThreads=8 -XX:ConcGCThreads=2",
            )
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
