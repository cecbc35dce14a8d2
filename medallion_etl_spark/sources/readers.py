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


def validate_sheet_rows(
    raw: DataFrame, schema: T.StructType, *, id_col: str | None = None
) -> DataFrame:
    """The reference's Excel row-validation contract as a pure
    DataFrame transform (hectolitros_loader.py:21-53), factored out of
    the Excel reader so the semantics are testable without an Excel
    engine:

    - every column is try_cast to the declared schema (bad values ->
      NULL — explicit, since ANSI-mode plain cast throws);
    - rows whose ``id_col`` fails the cast are SKIPPED (the reference
      skips non-numeric id cells — header junk, subtotal rows);
    - duplicate ids keep the LAST sheet occurrence (the reference
      builds a dict keyed by id, so later rows overwrite earlier ones).

    ``raw`` must carry a ``_row_order`` long column (sheet row number)
    when ``id_col`` is set; the Excel reader below adds it.
    """
    casted = raw.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            for f in schema.fields
            if f.name in raw.columns
        ],
        *([F.col("_row_order")] if "_row_order" in raw.columns else []),
    )
    if id_col is None:
        return casted
    valid = casted.filter(F.col(id_col).isNotNull())
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.partitionBy(id_col).orderBy(F.col("_row_order").desc())
    )
    return (
        valid.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_row_order")
    )


def read_excel_rows(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    sheet: int | str = 0,
    skip_rows: int = 0,
    id_col: str | None = None,
) -> DataFrame:
    """Reference S5: Excel sheet source with row validation
    (hectolitros_loader.py:21-53). Excel is driver-side by nature (one
    small file), so this goes pandas -> createDataFrame, then applies
    ``validate_sheet_rows`` (skip non-numeric ids, last-wins dedup).

    Gated: raises a clear error if no Excel engine is installed (this
    container ships none); the validation semantics are covered by
    tests/test_readers.py via a monkeypatched pandas reader."""
    import pandas as pd

    try:
        pdf = pd.read_excel(path, sheet_name=sheet, skiprows=skip_rows, header=0)
    except ImportError as e:  # openpyxl/xlrd absent
        raise NotImplementedError(
            "Excel source needs an engine (openpyxl); not available in this environment"
        ) from e
    # tolerate a sheet wider than the schema (trailing junk columns):
    # drop the surplus BEFORE renaming — assigning a shorter name list
    # than the column count is a pandas ValueError
    pdf = pdf.iloc[:, : len(schema.fields)]
    pdf.columns = [f.name for f in schema.fields][: len(pdf.columns)]
    pdf["_row_order"] = range(len(pdf))
    df = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    return validate_sheet_rows(df, schema, id_col=id_col)
