"""RESTORE (LakeTable.restore): roll the table back to an older
snapshot as ONE new metadata commit — Delta ``RESTORE TABLE … TO
VERSION AS OF`` analog. History is preserved (roll-forward to an old
state), the manifest rolls back with the data (so resume re-applies the
undone chunks and converges), and the change feed refuses to span the
restore (restored rows carry pre-restore LSNs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, canon

N_EVENTS = 3_000
N_KEYS = 200


@pytest.fixture()
def replayed(spark, tmp_path):
    """Versions 0..3 (create + one commit per 1k-LSN chunk)."""
    events = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS)
    root = str(tmp_path / "t")
    replay(spark, events, LakeTable.create(root, n_buckets=8), chunk_size=1_000)
    return LakeTable.load(root), events


def test_restore_reproduces_the_old_snapshot(spark, replayed):
    table, _ = replayed
    assert table.version == 3
    want = LakeTable.load_version(table.root, 1).read(spark).toPandas()

    res = table.restore(1)
    assert res == {"restored_to": 1, "version": 4}

    now = LakeTable.load(table.root)
    assert now.version == 4
    assert now.max_committed_lsn() == 999  # manifest rolled back too
    assert_frames_equal(now.read(spark).toPandas(), canon(want))

    # history preserved: the undone snapshots still time-travel
    head_pd = LakeTable.load_version(table.root, 3).read(spark).toPandas()
    assert len(head_pd) > 0


def test_resume_after_restore_reconverges(spark, replayed):
    """The rolled-back manifest makes chunks 1-2 pending again: feeding
    the same stream re-applies exactly them and lands on the original
    head state."""
    table, events = replayed
    head = table.read(spark).toPandas()
    table.restore(1)

    res = replay(spark, events, LakeTable.load(table.root), chunk_size=1_000)
    assert res["batches_applied"] == 2  # chunks 1 and 2 re-applied
    assert_frames_equal(
        LakeTable.load(table.root).read(spark).toPandas(), canon(head)
    )


def test_change_feed_refuses_to_span_a_restore(spark, replayed):
    table, events = replayed
    table.restore(1)

    current = LakeTable.load(table.root)
    with pytest.raises(ValueError, match="RESTORE"):
        current.read_changes(spark, since_version=2)

    # feeding from the restore commit itself is fine: replay the tail
    # and the feed sees exactly the re-applied net changes
    replay(spark, events, LakeTable.load(table.root), chunk_size=1_000)
    feed = LakeTable.load(table.root).read_changes(spark, since_version=4)
    assert feed.count() > 0
    # net change per key in (1000, 2999]
    want = (
        events.filter(F.col("lsn") > 999)
        .groupBy("doc_id")
        .agg(F.max("lsn").alias("lsn"))
        .count()
    )
    assert feed.count() == want


def test_restore_refuses_current_and_future_versions(spark, replayed):
    table, _ = replayed
    with pytest.raises(ValueError, match="STRICTLY older"):
        table.restore(3)
    with pytest.raises(ValueError, match="STRICTLY older"):
        table.restore(7)
    assert LakeTable.load(table.root).version == 3


def test_restore_across_a_rebucket_restores_the_layout(spark, replayed):
    table, _ = replayed
    v1_pd = LakeTable.load_version(table.root, 1).read(spark).toPandas()
    table.rebucket(spark, 16)
    table = LakeTable.load(table.root)
    assert table.n_buckets == 16

    table.restore(1)
    now = LakeTable.load(table.root)
    assert now.n_buckets == 8  # old bucket layout came back with the data
    assert_frames_equal(now.read(spark).toPandas(), canon(v1_pd))


def test_restore_survives_snapshot_expiry(spark, replayed):
    """After expiring everything but the restore commit, the table
    still reads: the old dirs the restore points at are referenced by
    the retained HEAD, so expiry must keep them."""
    table, _ = replayed
    want = LakeTable.load_version(table.root, 1).read(spark).toPandas()
    table.restore(1)
    LakeTable.load(table.root).expire_snapshots(keep_last=1, grace_seconds=0)
    now = LakeTable.load(table.root)
    assert_frames_equal(now.read(spark).toPandas(), canon(want))
    with pytest.raises(ValueError, match="no snapshot"):
        LakeTable.load_version(table.root, 3)
