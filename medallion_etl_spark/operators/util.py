"""Shared operator helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Repartition a small-on-disk table for CPU parallelism.

    Tables like ``documents`` are one input split (a few MB), so
    size-based splitting gives every downstream per-row computation ONE
    core; any operator doing heavy expression work per row (hashing,
    regex) repartitions first. At 100 TB inputs this is a no-op
    concern — splits are plentiful — but the operator shape must not
    serialize on small inputs either."""
    return df.repartition(spark.sparkContext.defaultParallelism)
