"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def broadcast_if_small(df: DataFrame) -> DataFrame:
    """``F.broadcast(df)`` only when Catalyst's own size estimate is at
    or under the session's autoBroadcastJoinThreshold, else ``df``
    unchanged (AQE picks the strategy from runtime stats).

    This is the 100x-safe spelling of a broadcast hint on a table that
    SCALES WITH THE CORPUS (customer/part/supplier grow with SF; at
    1000 executors x 100 TB a forced broadcast of one of them OOMs the
    driver). True fixed-size dims (nation=25, region=5, a calendar,
    a query/centroid set) keep their unconditional hint — their size is
    a property of the schema, not the data volume. The estimate is the
    optimizer's sizeInBytes on the driver: metadata-only, no job."""
    spark = df.sparkSession
    thresh = str(
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    ).strip()
    # Spark's ConfigHelpers.byteFromString strips the sign before
    # calling JavaUtils (which rejects '-1'); "-1" is the standard
    # spelling for broadcast-disabled, so mirror that here.
    if thresh.startswith("-"):
        return df
    jvm = spark._jvm
    thresh_bytes = int(
        jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(thresh)
    )
    est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    return F.broadcast(df) if est <= thresh_bytes else df


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a small-on-disk table for CPU parallelism.

    Tables like ``documents`` are one input split (a few MB), so
    size-based splitting gives every downstream per-row computation ONE
    core; any operator doing heavy expression work per row (hashing,
    regex) repartitions first. At 100 TB inputs this is a no-op
    concern — splits are plentiful — but the operator shape must not
    serialize on small inputs either."""
    return df.repartition(spark.sparkContext.defaultParallelism)
