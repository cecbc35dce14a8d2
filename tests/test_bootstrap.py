"""CONVERT bootstrap (cdc/bootstrap.py): an existing parquet dataset
becomes a LakeTable in one bulk commit — Delta CONVERT TO DELTA analog.
The converted table must be indistinguishable from a replayed one."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.bootstrap import convert_from_parquet
from medallion_etl_spark.cdc.dml import delete_where
from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, canon, expected_final_state


@pytest.fixture()
def source_parquet(spark, tmp_path):
    """A deduped snapshot parquet (one row per key) + its pandas frame."""
    events = gen_events(spark, n_events=2_000, n_keys=150)
    snap = (
        events.groupBy("doc_id")
        .agg(F.max_by(F.struct("op", "tokens", "n_tok", "source", "lang"), "lsn").alias("s"))
        .filter(F.col("s.op") != "D")
        .select("doc_id", "s.tokens", "s.n_tok", "s.source", "s.lang")
    )
    path = str(tmp_path / "snap")
    snap.write.parquet(path)
    return path, snap.toPandas()


def test_convert_round_trips_and_behaves_like_a_table(spark, tmp_path, source_parquet):
    path, want = source_parquet
    root = str(tmp_path / "t")
    res = convert_from_parquet(spark, path, root, n_buckets=8, schema_version=3)
    assert res["rows_converted"] == len(want)

    from medallion_etl_spark.cdc.bootstrap import CONVERT_BATCH_ID

    table = LakeTable.load(root)
    assert table.version == 1
    assert table.is_committed(CONVERT_BATCH_ID)
    assert table.max_committed_lsn() == 0
    assert_frames_equal(table.read(spark).toPandas(), canon(want))

    # the converted table is a NORMAL table: a later change stream
    # replays on top (every event outranks the bulk LSN 0) and DML works
    tail = gen_events(spark, n_events=1_000, n_keys=150).withColumn(
        "lsn", F.col("lsn") + 1
    )
    replay(spark, tail, LakeTable.load(root), chunk_size=500)
    dele = delete_where(spark, LakeTable.load(root), "n_tok >= 32")
    assert dele["committed"]
    # oracle: converted rows at LSN 0 ∪ the tail, LWW, then the delete
    base = want.copy()
    base["lsn"] = 0
    base["op"] = "U"
    merged = expected_final_state(pd.concat([base, tail.toPandas()], ignore_index=True))
    merged = merged[~(merged["n_tok"] >= 32)]
    assert_frames_equal(LakeTable.load(root).read(spark).toPandas(), canon(merged))


def test_convert_refusals_are_all_or_nothing(spark, tmp_path, source_parquet):
    path, _ = source_parquet
    df = spark.read.parquet(path)

    # duplicate keys: no defined LWW winner at one shared LSN
    with pytest.raises(ValueError, match="more than once"):
        convert_from_parquet(
            spark, df.unionByName(df), str(tmp_path / "a"), schema_version=3
        )
    assert not os.path.exists(str(tmp_path / "a"))

    with pytest.raises(ValueError, match="missing table columns"):
        convert_from_parquet(spark, df.drop("n_tok"), str(tmp_path / "b"), schema_version=3)

    # a CHECK violation aborts and removes the half-created root
    with pytest.raises(ValueError, match="check:cap"):
        convert_from_parquet(
            spark,
            df,
            str(tmp_path / "c"),
            schema_version=3,
            constraints={"cap": "n_tok <= 10"},
        )
    assert not LakeTable.exists(str(tmp_path / "c"))

    # existing-table refusal
    root = str(tmp_path / "t")
    convert_from_parquet(spark, df, root, schema_version=3)
    with pytest.raises(ValueError, match="already a table"):
        convert_from_parquet(spark, df, root, schema_version=3)
