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


_PERSIST_SLOTS: dict[tuple, DataFrame] = {}


def persist_replacing(slot: str, key, df: DataFrame, level=None) -> DataFrame:
    """``persist()`` with a named slot: re-invoking the same operator
    in one process (the driver window plus a verify pass, bench reps)
    REPLACES — and unpersists — the previous invocation's intermediate
    instead of stacking forgotten cached blocks for the session's
    lifetime. Each invocation still computes fresh, so benchmarks
    measure real work, not slot hits; only the abandoned old blocks
    are released. Keyed by (applicationId, slot, key) so a restarted
    session never reaches through a dead handle."""
    k = (df.sparkSession.sparkContext.applicationId, slot, key)
    old = _PERSIST_SLOTS.get(k)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # previous session gone: nothing to release
    out = df.persist(level) if level is not None else df.persist()
    _PERSIST_SLOTS[k] = out
    return out
