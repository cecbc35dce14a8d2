"""Sink operators (SURVEY.md §2.1 S6-S11): the reference's write
patterns re-expressed as Spark writers.

| Reference pattern                                   | Here |
|-----------------------------------------------------|------|
| S6 bulk append (execute_values)                     | append() |
| S7 delete+insert partition replacement by range     | replace_partitions() — dynamic partition overwrite |
| S8 full refresh (DELETE all + INSERT)               | full_refresh() |
| S9 upsert ON CONFLICT DO UPDATE                     | cdc.table.LakeTable + cdc.apply (MERGE engine) |
| S10 ON CONFLICT DO NOTHING (insert-if-absent)       | insert_if_absent() |
| S11 incremental anti-join load                      | insert_if_absent() (same primitive) |

Scale notes: replace_partitions uses
``spark.sql.sources.partitionOverwriteMode=dynamic`` so ONLY the
partitions present in the incoming frame are rewritten — the Spark
analog of the reference's indexed ``DELETE WHERE date BETWEEN`` +
re-insert (reference sales_loader.py:64-73), idempotent by
construction: replaying a range converges. Untouched partitions are
never read or written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def append(df: DataFrame, path: str) -> None:
    """S6: bulk append (reference sales_loader.py:98-112)."""
    df.write.mode("append").parquet(path)


def full_refresh(df: DataFrame, path: str) -> None:
    """S8: full-table replace (reference clients_transformer.py:38-40)."""
    df.write.mode("overwrite").parquet(path)


def replace_partitions(df: DataFrame, path: str, *partition_cols: str) -> None:
    """S7: idempotent partition replacement — only partitions present
    in ``df`` are overwritten; all others are untouched (reference's
    delete+insert-by-date-range, sales_transformer.py:50-55)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def insert_if_absent(
    spark: SparkSession, new_rows: DataFrame, path: str, keys: list[str]
) -> int:
    """S10/S11: append only rows whose key is not already present
    (reference ``ON CONFLICT DO NOTHING`` branches_transformer.py:47 and
    the hectolitros anti-join incremental load, hectolitros_loader.py:
    69-73). Null-safe on keys — the reference's BUG-004 (NULL keys
    slip past ON CONFLICT because NULL<>NULL) is fixed here by using
    null-safe equality.

    Returns the number of rows appended. NOT atomic vs concurrent
    writers (neither is the reference); the CDC LakeTable is the
    concurrency-safe path.
    """
    import os

    if os.path.exists(path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs
    ):
        existing = spark.read.parquet(path).select(*keys)
        cond = [new_rows[k].eqNullSafe(existing[k]) for k in keys]
        fresh = new_rows.join(existing, cond, "left_anti")
    else:
        fresh = new_rows
    # persist across count + write: two actions over the unpersisted
    # anti-join would re-read the target parquet twice, and an append
    # landing between them would make the returned count disagree with
    # what this call wrote
    fresh = fresh.dropDuplicates(keys).persist()
    try:
        n = fresh.count()
        if n:
            fresh.write.mode("append").parquet(path)
    finally:
        fresh.unpersist(blocking=False)
    return n


def signed_measure(qty_col: str, flag_col: str, negative_token: str) -> F.Column:
    """Reference P8/P9 family helper: a measure signed by a flag token
    (credit notes negate quantities — cobertura HAVING semantics)."""
    return F.col(qty_col) * F.when(F.col(flag_col) == negative_token, -1).otherwise(1)
