"""Per-partition lineage: each applied batch records, per table bucket,
the source LSN range, rows applied, and bytes written.

Reference analog: per-run throughput logging (reference
sales_transformer.py:240-242) — upgraded to a queryable table as the
north_star requires. Written under ``<table_root>/lineage/batch_id=N/``
so a resumed re-apply of the same batch overwrites its own records
(idempotent), and the whole history reads back as one partitioned
parquet table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import LINEAGE_SCHEMA


def lineage_dir(table_root: str) -> str:
    return os.path.join(table_root, "lineage")


def write_lineage(spark: SparkSession, table_root: str, batch_id: int, rows: list[dict]) -> None:
    if not rows:
        return
    df = spark.createDataFrame(
        [
            (
                int(r["batch_id"]),
                int(r["partition_id"]),
                int(r["lsn_lo"]),
                int(r["lsn_hi"]),
                int(r["rows_applied"]),
                int(r["bytes_written"]),
            )
            for r in rows
        ],
        LINEAGE_SCHEMA,
    )
    out = os.path.join(lineage_dir(table_root), f"batch_id={batch_id}")
    df.drop("batch_id").coalesce(1).write.mode("overwrite").parquet(out)


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    path = lineage_dir(table_root)
    if not os.path.exists(path):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.parquet(path)
