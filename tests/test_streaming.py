"""Structured Streaming replay (readStream -> foreachBatch -> the same
apply_batch), plus the order-independence guarantees the tombstone
merge provides: out-of-order batch application converges, stale
updates cannot resurrect deleted keys, and compact() purges tombstones
without changing the visible table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.cdc.apply import apply_batch
from medallion_etl_spark.cdc.table import LakeTable
from medallion_etl_spark.schemas import EVENTS_SCHEMA
from medallion_etl_spark.streaming.stream_replay import stream_replay
from medallion_etl_spark.synth import gen_events, write_events_shuffled

from .cdc_oracle import assert_frames_equal, expected_final_state

N_EVENTS = 4_000
N_KEYS = 300


@pytest.fixture(scope="module")
def events_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sevents") / "stream")
    df = gen_events(spark, n_events=N_EVENTS, n_keys=N_KEYS, hot_fraction=0.25, n_hot=3)
    write_events_shuffled(df, path, n_files=8)
    return path


@pytest.fixture(scope="module")
def events_pdf(spark, events_path):
    return spark.read.parquet(events_path).toPandas()


def test_stream_replay_matches_oracle(spark, tmp_path, events_path, events_pdf):
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    totals = stream_replay(
        spark,
        events_path,
        root,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,  # 8 files -> 4 micro-batches
    )
    assert totals["epochs"] >= 2
    table = LakeTable.load(root)
    assert_frames_equal(table.read(spark).toPandas(), expected_final_state(events_pdf))
    assert table.schema_version == 3  # evolution applied mid-stream


def test_stream_redrain_is_noop(spark, tmp_path, events_path, events_pdf):
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    stream_replay(spark, events_path, root, ckpt, max_files_per_trigger=4)
    v1 = LakeTable.load(root).version
    totals2 = stream_replay(spark, events_path, root, ckpt, max_files_per_trigger=4)
    assert totals2["epochs"] == 0  # checkpoint: nothing new to read
    assert LakeTable.load(root).version == v1
    assert_frames_equal(
        LakeTable.load(root).read(spark).toPandas(), expected_final_state(events_pdf)
    )


def test_streaming_after_batch_replay_same_table(spark, tmp_path, events_path, events_pdf):
    """Batch-replay part of the stream (manifest ids 0..n), then drain
    the REST via streaming onto the same table: streaming epoch ids
    are namespaced, so epoch 0 must not collide with batch chunk 0 and
    silently skip (the data-loss bug this pins)."""
    from medallion_etl_spark.cdc.replay import replay

    root = str(tmp_path / "t")
    table = LakeTable.create(root, n_buckets=8)
    events = spark.read.parquet(events_path)
    first_half = events.filter(F.col("lsn") < N_EVENTS // 2)
    replay(spark, first_half, table, chunk_size=N_EVENTS // 4)  # commits batch ids 0,1
    assert 0 in LakeTable.load(root).committed_batches()

    # second half arrives as a stream into the SAME table
    tail_dir = str(tmp_path / "tail")
    events.filter(F.col("lsn") >= N_EVENTS // 2).repartition(2).write.parquet(tail_dir)
    totals = stream_replay(spark, tail_dir, root, str(tmp_path / "ckpt"))
    assert totals["epochs"] >= 1 and totals["epochs_skipped"] == 0
    assert_frames_equal(
        LakeTable.load(root).read(spark).toPandas(), expected_final_state(events_pdf)
    )


def test_out_of_order_batches_converge(spark, tmp_path, events_path, events_pdf):
    """Apply the LSN chunks in scrambled order: the tombstone merge is
    max-LSN-wins, so the final state must equal in-order replay."""
    root = str(tmp_path / "t")
    table = LakeTable.create(root, n_buckets=8)
    events = spark.read.parquet(events_path)
    chunks = [(i, i * 1000, i * 1000 + 999) for i in range(4)]
    for batch_id, lo, hi in [chunks[2], chunks[0], chunks[3], chunks[1]]:
        apply_batch(
            spark,
            LakeTable.load(root),
            events.filter(F.col("lsn").between(lo, hi)),
            batch_id=batch_id,
            lsn_lo=lo,
            lsn_hi=hi,
        )
    assert_frames_equal(
        LakeTable.load(root).read(spark).toPandas(), expected_final_state(events_pdf)
    )
    del table


def test_stale_update_cannot_resurrect_deleted_key(spark, tmp_path):
    """Delete at LSN 20 applied first; update at LSN 10 arrives later
    (out-of-order). The tombstone must win."""
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4)

    def ev(lsn, op, doc_id, tok):
        return (lsn, op, doc_id, None if op == "D" else [tok], None if op == "D" else 1,
                None if op == "D" else "web", None, 1)

    late_delete = spark.createDataFrame([ev(20, "D", "k1", 0), ev(21, "U", "k2", 7)], EVENTS_SCHEMA)
    stale_update = spark.createDataFrame([ev(10, "U", "k1", 5)], EVENTS_SCHEMA)

    apply_batch(spark, LakeTable.load(root), late_delete, batch_id=1, lsn_lo=20, lsn_hi=21)
    apply_batch(spark, LakeTable.load(root), stale_update, batch_id=0, lsn_lo=10, lsn_hi=10)

    got = LakeTable.load(root).read(spark).toPandas()
    assert set(got["doc_id"]) == {"k2"}  # k1 stays dead

    raw = LakeTable.load(root).read(spark, raw=True).toPandas()
    tomb = raw[raw["doc_id"] == "k1"]
    assert len(tomb) == 1 and bool(tomb.iloc[0]["_deleted"]) and tomb.iloc[0]["_lsn"] == 20


def test_compact_purges_tombstones(spark, tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4)
    rows = [
        (1, "I", "a", [1], 1, "web", None, 1),
        (2, "I", "b", [2], 1, "web", None, 1),
        (3, "D", "a", None, None, None, None, 1),
    ]
    apply_batch(spark, LakeTable.load(root), spark.createDataFrame(rows, EVENTS_SCHEMA),
                batch_id=0, lsn_lo=1, lsn_hi=3)
    t = LakeTable.load(root)
    raw = t.read(spark, raw=True).toPandas()
    assert len(raw) == 2  # b + tombstone(a)

    # watermark below the tombstone: nothing purged
    t.compact(spark, watermark_lsn=2)
    assert len(LakeTable.load(root).read(spark, raw=True).toPandas()) == 2

    before = LakeTable.load(root).read(spark).toPandas()
    LakeTable.load(root).compact(spark, watermark_lsn=3)
    t2 = LakeTable.load(root)
    raw2 = t2.read(spark, raw=True).toPandas()
    assert len(raw2) == 1 and set(raw2["doc_id"]) == {"b"}
    assert_frames_equal(t2.read(spark).toPandas(), before)  # visible table unchanged


def test_stream_replay_mor_matches_oracle(spark, tmp_path, events_path, events_pdf):
    """Micro-batches drained through the MERGE-ON-READ write path:
    every epoch is a per-bucket delta append, and the state read
    through the fold must equal the COW streaming result — the write
    mode is a physical choice the stream's consumer never sees."""
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    totals = stream_replay(
        spark,
        events_path,
        root,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
        write_mode="mor",
    )
    assert totals["epochs"] >= 2
    table = LakeTable.load(root)
    deltas = {
        int(b): len(e.get("deltas", []))
        for b, e in table.meta["buckets"].items()
        if e.get("deltas")
    }
    assert deltas, "MOR streaming left no delta appends"
    assert_frames_equal(table.read(spark).toPandas(), expected_final_state(events_pdf))
    assert table.schema_version == 3  # evolution applied mid-stream
