"""Iceberg runtime gate (SURVEY.md §7.4): detection is honest
try/except at the JVM boundary, the factory falls back to the Parquet
LakeTable, and the MERGE SQL the Iceberg path would run pins the same
LWW/tombstone semantics apply.py implements."""

from __future__ import annotations

import pytest

from medallion_etl_spark.cdc.iceberg import (
    configured_iceberg_catalogs,
    iceberg_runtime_available,
    merge_upsert_sql,
    open_table,
)
from medallion_etl_spark.cdc.table import LakeTable


def test_gate_detects_absent_runtime(spark):
    # this container ships no Iceberg jar; the gate must say so
    # without raising (on a cluster image with the jar it flips true)
    assert iceberg_runtime_available(spark) is False
    assert configured_iceberg_catalogs(spark) == []


@pytest.mark.skipif(
    True, reason="requires an Iceberg runtime jar; none in this container"
)
def test_gate_detects_present_runtime(spark):
    assert iceberg_runtime_available(spark) is True


def test_open_table_falls_back_to_lake_table(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "t"), create=True, n_buckets=4)
    assert isinstance(t, LakeTable)
    t2 = open_table(spark, str(tmp_path / "t"))
    assert isinstance(t2, LakeTable) and t2.n_buckets == 4


def test_merge_sql_pins_lww_and_tombstone_semantics():
    sql = merge_upsert_sql("cat.db.docs", "chunk_winners", "doc_id", ["tokens", "n_tok"])
    # null-safe key equality (reference BUG-004 fix)
    assert "ON t.doc_id <=> s.doc_id" in sql
    # strictly-higher LSN wins; equal-LSN redelivery is a no-op
    assert "WHEN MATCHED AND s._lsn > t._lsn THEN UPDATE" in sql
    # deletes travel as tombstone columns, never a SQL DELETE clause
    assert "_deleted" in sql and "WHEN MATCHED AND" in sql and "DELETE" not in sql.replace("_deleted", "")
    assert sql.index("WHEN NOT MATCHED THEN INSERT") > sql.index("WHEN MATCHED")
