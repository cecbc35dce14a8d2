"""Malformed-event policy (cdc/quarantine.py).

A WAL tail has no extract-time gatekeeper (the reference leans on
psycopg2 + typed DDL to reject bad rows before load), so the replayer
owns it: NULL-lsn / NULL-key / unknown-op events must never silently
upsert — an op of 'X' would otherwise fall into the "not a delete"
branch and write garbage into the table.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.replay import replay
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.synth import gen_events

from .cdc_oracle import assert_frames_equal, expected_final_state

N_EVENTS = 3_000
N_KEYS = 200


@pytest.fixture(scope="module")
def streams(spark, tmp_path_factory):
    """(dirty_path, clean_path, n_bad): the dirty stream is the clean
    one plus 6 malformed rows — 2 NULL keys, 2 NULL lsns, 2 unknown
    ops. The bad-op rows sit ABOVE the clean max lsn so the final
    planned chunk contains only malformed events (the all-bad-chunk
    edge must still commit)."""
    root = tmp_path_factory.mktemp("quarantine")
    clean = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS)
    null_key = (
        clean.orderBy("lsn")
        .limit(2)
        .withColumn("lsn", F.col("lsn") + F.lit(N_EVENTS).cast("long"))
        .withColumn("doc_id", F.lit(None).cast("string"))
    )
    null_lsn = (
        clean.orderBy("lsn").limit(2).withColumn("lsn", F.lit(None).cast("long"))
    )
    bad_op = (
        clean.orderBy("lsn")
        .limit(2)
        .withColumn("lsn", F.col("lsn") + F.lit(10 * N_EVENTS).cast("long"))
        .withColumn("op", F.lit("X"))
    )
    dirty = clean.unionByName(null_key).unionByName(null_lsn).unionByName(bad_op)
    clean_path = str(root / "clean")
    dirty_path = str(root / "dirty")
    clean.write.parquet(clean_path)
    dirty.coalesce(4).write.parquet(dirty_path)
    return dirty_path, clean_path, 6


def _final(spark, root):
    return LakeTable.load(root).read(spark).toPandas()


def test_fail_mode_applies_nothing(spark, tmp_path, streams):
    dirty_path, _, n_bad = streams
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    with pytest.raises(ValueError, match=rf"{n_bad} malformed"):
        replay(spark, spark.read.parquet(dirty_path), table, chunk_size=1_000)
    # the raise happened before ANY chunk was applied
    reloaded = LakeTable.load(table.root)
    assert reloaded.committed_batches() == {}
    assert reloaded.read(spark).count() == 0


def test_quarantine_diverts_and_matches_clean_replay(spark, tmp_path, streams):
    dirty_path, clean_path, n_bad = streams
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res = replay(
        spark,
        spark.read.parquet(dirty_path),
        table,
        chunk_size=1_000,
        on_malformed="quarantine",
    )
    assert res["rows_quarantined"] == n_bad
    # the chunk plan spans the raw bounds: the all-bad top chunk
    # commits as an empty batch, so resume never re-reads it
    assert res["batches_applied"] == res["planned_chunks"]

    # quarantined rows carry their reason; nothing was lost or
    # invented. NULL-lsn rows live in the stream-bounds-keyed
    # range-null-LO-HI sibling dir (stable across resumes — a
    # pending-window key would duplicate them; a single fixed dir
    # would let a later ingest destroy an earlier window's rows),
    # LSN-ranged rows under the per-window dir.
    qdf = spark.read.parquet(res["quarantine_path"])
    reasons = {r["_reason"]: r["cnt"] for r in qdf.groupBy("_reason").agg(F.count("*").alias("cnt")).collect()}
    assert reasons == {"null_key": 2, "bad_op": 2}
    assert "range-null-" in os.path.basename(res["quarantine_null_path"])
    qnull = spark.read.parquet(res["quarantine_null_path"])
    assert {r["_reason"] for r in qnull.select("_reason").collect()} == {"null_lsn"}
    assert qnull.count() == 2

    # table state is exactly the clean stream's replay
    expected = expected_final_state(spark.read.parquet(clean_path).toPandas())
    assert_frames_equal(_final(spark, table.root), expected)

    # redelivery: nothing re-applies, quarantine dir untouched
    res2 = replay(
        spark,
        spark.read.parquet(dirty_path),
        LakeTable.load(table.root),
        chunk_size=1_000,
        on_malformed="quarantine",
    )
    assert res2["batches_applied"] == 0
    assert "rows_quarantined" not in res2
    assert spark.read.parquet(res["quarantine_path"]).count() == n_bad - 2
    # a discovery scan over the whole quarantine root counts each bad
    # row exactly once (the NULL-lsn dir is stream-bounds-keyed, so a
    # redelivery overwrote it in place rather than adding a sibling)
    qroot = os.path.join(table.root, "_quarantine")
    assert sorted(os.listdir(qroot)) == sorted(
        [
            os.path.basename(res["quarantine_path"]),
            os.path.basename(res["quarantine_null_path"]),
        ]
    )
    total = sum(
        spark.read.parquet(os.path.join(qroot, d)).count() for d in os.listdir(qroot)
    )
    assert total == n_bad


def test_null_quarantine_survives_later_windows(spark, tmp_path):
    """A later ingest window must never destroy an earlier window's
    NULL-lsn diagnostics, while a GROWN stream (which re-sees and
    rewrites the old nulls) sweeps the dir its span subsumes."""
    qroot = str(tmp_path / "shared_quarantine")
    clean = gen_events(spark, n_events=1_000, n_keys=50)
    null_row = clean.limit(1).withColumn("lsn", F.lit(None).cast("long"))
    day1 = clean.unionByName(null_row)
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    res1 = replay(
        spark,
        day1,
        table,
        chunk_size=500,
        on_malformed="quarantine",
        quarantine_dir=qroot,
    )
    dir1 = res1["quarantine_null_path"]
    assert os.path.isdir(dir1)

    # the stream GROWS (same start, larger hi): the dir is keyed by
    # the stream START, so the resume overwrites the SAME dir in
    # place — no second dir, no double count
    grown = day1.unionByName(
        clean.limit(5).withColumn("lsn", F.col("lsn") + F.lit(1_000).cast("long"))
    )
    res2 = replay(
        spark,
        grown,
        LakeTable.load(table.root),
        chunk_size=500,
        on_malformed="quarantine",
        quarantine_dir=qroot,
    )
    dir2 = res2["quarantine_null_path"]
    assert dir2 == dir1, "growth must not move the null dir"
    assert spark.read.parquet(dir2).count() == 1
    assert len([d for d in os.listdir(qroot) if d.startswith("range-null")]) == 1

    # a DISJOINT later window — another table's stream sharing the
    # same quarantine root (the one-table batch replayer pins one
    # stream per table; a moved window there raises by design) — must
    # leave the first stream's null diagnostics alone
    day2 = (
        gen_events(spark, n_events=1_000, n_keys=50)
        .withColumn("lsn", F.col("lsn") + F.lit(10_000).cast("long"))
        .unionByName(null_row)
    )
    table2 = LakeTable.create(str(tmp_path / "t2"), n_buckets=4)
    res3 = replay(
        spark,
        day2,
        table2,
        chunk_size=500,
        on_malformed="quarantine",
        quarantine_dir=qroot,
    )
    dir3 = res3["quarantine_null_path"]
    assert dir3 not in (dir1, dir2)
    assert os.path.exists(dir2), "earlier window's null diagnostics were destroyed"
    assert os.path.exists(dir3)


def test_kill_and_resume_never_double_counts_quarantine(spark, tmp_path, streams):
    """A mid-replay kill leaves some chunks committed; the resume
    re-splits only the pending window. With chunk-partitioned dynamic
    overwrite, the resume rewrites exactly the still-pending chunks'
    partitions — a discovery scan over _quarantine/* counts every bad
    row exactly once after the resume."""
    dirty_path, _, n_bad = streams
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res1 = replay(
        spark,
        spark.read.parquet(dirty_path),
        table,
        chunk_size=1_000,
        max_batches=2,  # simulate a kill after 2 of the planned chunks
        on_malformed="quarantine",
    )
    assert res1["batches_applied"] == 2
    res2 = replay(
        spark,
        spark.read.parquet(dirty_path),
        LakeTable.load(table.root),
        chunk_size=1_000,
        on_malformed="quarantine",
    )
    assert res2["batches_applied"] > 0
    qroot = os.path.join(table.root, "_quarantine")
    total = sum(
        spark.read.parquet(os.path.join(qroot, d)).count() for d in os.listdir(qroot)
    )
    assert total == n_bad, f"discovery scan counted {total}, expected {n_bad}"


def test_all_null_stream_follows_policy(spark, tmp_path):
    """A stream where EVERY event has a NULL lsn has no chunk plan at
    all — it must still route through the malformed policy, never
    report clean success while silently discarding everything."""
    clean = gen_events(spark, n_events=200, n_keys=20)
    all_null = clean.withColumn("lsn", F.lit(None).cast("long"))

    t1 = LakeTable.create(str(tmp_path / "t1"), n_buckets=4)
    with pytest.raises(ValueError, match="200 malformed"):
        replay(spark, all_null, t1, chunk_size=100)

    t2 = LakeTable.create(str(tmp_path / "t2"), n_buckets=4)
    res = replay(spark, all_null, t2, chunk_size=100, on_malformed="quarantine")
    assert res["rows_quarantined"] == 200
    assert res["quarantine_path"] is None
    assert spark.read.parquet(res["quarantine_null_path"]).count() == 200
    assert res["batches_applied"] == 0

    t3 = LakeTable.create(str(tmp_path / "t3"), n_buckets=4)
    res = replay(spark, all_null, t3, chunk_size=100, on_malformed="drop")
    assert res["rows_dropped"] == 200
    assert res["batches_applied"] == 0

    # once the stream gains real lsns, the bounded run re-sees every
    # null row and retires the unbounded dir — the scan stays exact
    res2 = replay(
        spark,
        clean.unionByName(all_null.limit(3)),
        LakeTable.load(t2.root),
        chunk_size=100,
        on_malformed="quarantine",
    )
    assert res2["rows_quarantined"] == 3
    qroot = os.path.join(t2.root, "_quarantine")
    null_dirs = [d for d in os.listdir(qroot) if d.startswith("range-null")]
    assert len(null_dirs) == 1
    assert spark.read.parquet(os.path.join(qroot, null_dirs[0])).count() == 3


def test_all_null_bad_rows_keep_path_keys(spark, tmp_path):
    """When every malformed row is NULL-lsn, the result still carries
    BOTH path keys (quarantine_path=None), so consumers on the old
    res['quarantine_path'] contract get None, not KeyError."""
    clean = gen_events(spark, n_events=500, n_keys=20)
    dirty = clean.unionByName(
        clean.limit(2).withColumn("lsn", F.lit(None).cast("long"))
    )
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=4)
    res = replay(spark, dirty, table, chunk_size=500, on_malformed="quarantine")
    assert res["rows_quarantined"] == 2
    assert "quarantine_path" in res and res["quarantine_path"] is None
    assert res["quarantine_null_path"] is not None
    assert spark.read.parquet(res["quarantine_null_path"]).count() == 2


def test_drop_mode_counts_and_matches(spark, tmp_path, streams):
    dirty_path, clean_path, n_bad = streams
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res = replay(
        spark,
        spark.read.parquet(dirty_path),
        table,
        chunk_size=1_000,
        on_malformed="drop",
    )
    assert res["rows_dropped"] == n_bad
    assert not os.path.exists(os.path.join(table.root, "_quarantine"))
    expected = expected_final_state(spark.read.parquet(clean_path).toPandas())
    assert_frames_equal(_final(spark, table.root), expected)


def test_clean_stream_unaffected_by_policy(spark, tmp_path, streams):
    _, clean_path, _ = streams
    table = LakeTable.create(str(tmp_path / "t"), n_buckets=8)
    res = replay(
        spark,
        spark.read.parquet(clean_path),
        table,
        chunk_size=1_000,
        on_malformed="quarantine",
    )
    assert "rows_quarantined" not in res
    assert not os.path.exists(os.path.join(table.root, "_quarantine"))
    expected = expected_final_state(spark.read.parquet(clean_path).toPandas())
    assert_frames_equal(_final(spark, table.root), expected)


def test_streaming_quarantine_matches_batch(spark, tmp_path, streams):
    from medallion_etl_spark.streaming.stream_replay import stream_replay

    dirty_path, clean_path, n_bad = streams
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    totals = stream_replay(
        spark,
        dirty_path,
        root,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        on_malformed="quarantine",
    )
    assert totals["rows_quarantined"] == n_bad
    expected = expected_final_state(spark.read.parquet(clean_path).toPandas())
    assert_frames_equal(_final(spark, root), expected)


def test_streaming_fail_mode_fails_the_query(spark, tmp_path, streams):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from medallion_etl_spark.streaming.stream_replay import stream_replay

    dirty_path, _, _ = streams
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    with pytest.raises(StreamingQueryException, match="malformed"):
        stream_replay(spark, dirty_path, root, str(tmp_path / "ckpt"))
