"""Typed sources (SURVEY.md §2.1).

The reference pulls from a paginated ERP REST API (S1-S3), a
semicolon-delimited CSV (S4) and an Excel sheet (S5). In this engine
every source lands as a DataFrame with an explicit schema — never
inferSchema in production paths — and batch fan-out (month × depot
loops in the reference) becomes partition-parallel reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table from a testdata scale dir (columnar scan with
    pushdown — the engine's default source)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_csv_semicolon(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Reference S4: ``csv.DictReader(delimiter=';')`` in
    depositos_loader.py:15-62 -> declarative CSV scan."""
    reader = spark.read.option("delimiter", ";").option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_json_records(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Reference S1-S3: raw JSON blobs landing in bronze. Explicit
    schema so nested arrays (eClifuerza, eAgrupaciones, CanalesMkt)
    arrive as ArrayType(StructType) ready for explode."""
    return spark.read.schema(schema).json(path)
