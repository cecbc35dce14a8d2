"""Round-3 review findings on the feed/replay protocol surface:

1. An out-of-LSN-order commit inside a change-feed span is invisible
   to LSN-watermark pruning — read_changes and the lake_feed planner
   must refuse the span loudly (the restore-gate treatment), while
   empty commits stay exempt.
2. Streaming quarantine dirs carry the per-checkpoint stream
   namespace, so two streams' epoch-0 diversions can't overwrite each
   other.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.apply import apply_batch
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.schemas import EVENTS_SCHEMA


def _ev_df(spark, lsns):
    rows = [
        (lsn, "U", f"k{lsn % 7}", [lsn, 1, 2], 3, "s", None, 2) for lsn in lsns
    ]
    return spark.createDataFrame(rows, EVENTS_SCHEMA)


@pytest.fixture()
def out_of_order_table(spark, tmp_path):
    """Chunk B (lsn 100-199) committed BEFORE chunk A (lsn 0-99)."""
    t = LakeTable.create(str(tmp_path / "t"), n_buckets=4, schema_version=2)
    apply_batch(spark, t, _ev_df(spark, range(100, 200)), batch_id=1, lsn_lo=100, lsn_hi=199)
    t = LakeTable.load(t.root)
    v_mid = t.version
    apply_batch(spark, t, _ev_df(spark, range(0, 100)), batch_id=0, lsn_lo=0, lsn_hi=99)
    return LakeTable.load(t.root), v_mid


def test_read_changes_refuses_out_of_order_span(spark, out_of_order_table):
    table, v_mid = out_of_order_table
    with pytest.raises(ValueError, match="at or below"):
        table.read_changes(spark, since_version=v_mid)
    # from v0 the watermark is -1: nothing crosses, full feed works
    feed = table.read_changes(spark, since_version=0)
    assert feed.count() > 0


def test_lake_feed_refuses_out_of_order_span(spark, out_of_order_table, tmp_path):
    from medallion_etl_spark.streaming.feed_source import read_feed_stream

    table, v_mid = out_of_order_table
    feed = read_feed_stream(spark, table.root, start_version=v_mid)
    q = (
        feed.writeStream.format("memory")
        .queryName("ooo_feed")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="at or below|fresh bootstrap"):
        q.awaitTermination(120)
        raise AssertionError("query should have failed")


def test_empty_commit_below_watermark_is_exempt(spark, tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), n_buckets=4, schema_version=2)
    apply_batch(spark, t, _ev_df(spark, range(100, 200)), batch_id=1, lsn_lo=100, lsn_hi=199)
    t = LakeTable.load(t.root)
    v_mid = t.version
    # an EMPTY batch planned over an old range (a resume probe / a
    # net-empty refresh span) adds no rows -> must not trip the gate
    apply_batch(
        spark, t, _ev_df(spark, []), batch_id=0, lsn_lo=0, lsn_hi=99
    )
    t = LakeTable.load(t.root)
    assert t.read_changes(spark, since_version=v_mid).count() == 0


def test_stream_quarantine_dirs_are_namespaced(spark, tmp_path):
    from medallion_etl_spark.streaming.stream_replay import (
        stream_namespace,
        stream_replay,
    )

    bad = _ev_df(spark, [999]).withColumn("lsn", F.lit(None).cast("long"))
    events = _ev_df(spark, range(0, 50)).unionByName(bad)
    ev_dir = str(tmp_path / "events")
    events.coalesce(1).write.parquet(ev_dir)
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4, schema_version=2)
    ckpt = str(tmp_path / "ck")
    totals = stream_replay(
        spark, ev_dir, root, ckpt, on_malformed="quarantine"
    )
    assert totals["rows_quarantined"] == 1
    dirs = [
        os.path.basename(d)
        for d in glob.glob(os.path.join(root, "_quarantine", "epoch-*"))
    ]
    ns = stream_namespace(ckpt)
    assert dirs and all(d.startswith(f"epoch-{ns}-") for d in dirs)
