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

    ``parallelism`` maps to ``local[N]`` in the sandbox; on a cluster
    the master URL comes from spark-submit and this arg is ignored by
    Spark (builder master is only applied when no master is set).
    """
    n = parallelism or DEFAULT_PARALLELISM
    shuffle = shuffle_partitions or max(n, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # JVM ergonomics size GC threads to the HOST's cores (23 on the
        # 32-core sandbox); with local[32] task threads that is a 60+
        # thread storm that collapses throughput ~4x on agg-heavy
        # plans. Cap parallel GC; only effective when this session
        # launches the JVM (first getOrCreate in the process).
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
