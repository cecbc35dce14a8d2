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
from pyspark.sql import functions as F
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


def read_excel_rows(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sheet: int | str = 0,
    skip_rows: int = 0,
) -> DataFrame:
    """Reference S5: Excel sheet source with row validation
    (hectolitros_loader.py:21-53 — openpyxl iter_rows, skip junk rows,
    last-write-wins on duplicate ids). Excel is driver-side by nature
    (one small file), so this goes pandas -> createDataFrame; rows
    failing the declared schema's casts become NULLs the caller
    filters, matching the reference's skip-non-numeric behavior.

    Gated: raises a clear error if no Excel engine is installed (this
    container ships none)."""
    try:
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, skiprows=skip_rows, header=0)
    except ImportError as e:  # openpyxl/xlrd absent
        raise NotImplementedError(
            "Excel source needs an engine (openpyxl); not available in this environment"
        ) from e
    pdf.columns = [f.name for f in schema.fields][: len(pdf.columns)]
    df = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    casted = df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields if f.name in df.columns]
    )
    return casted
