"""Optimistic-concurrency commit: racing writers serialize under the
metadata flock; the loser gets RuntimeError and retries from a fresh
load — no commit (batch record or version) is ever lost. The
lost-update race test is pure metadata (no Spark); the replay-level
test drives the reload-and-retry path end-to-end."""

from __future__ import annotations

import threading

from medallion_etl_spark.cdc.table import LakeTable

N_WRITERS = 16


def test_concurrent_commits_never_lose_updates(tmp_path):
    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=4)
    errors: list[Exception] = []
    barrier = threading.Barrier(N_WRITERS)

    def writer(i: int) -> None:
        try:
            barrier.wait()
            while True:
                t = LakeTable.load(root)
                try:
                    t.commit(
                        {},
                        set(),
                        (1_000 + i, {"lsn_lo": i, "lsn_hi": i, "rows_applied": 0}),
                    )
                    return
                except RuntimeError:
                    continue  # lost the race: reload and retry
        except Exception as exc:  # pragma: no cover - surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(N_WRITERS)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors
    final = LakeTable.load(root)
    # every writer's commit landed in its own version; none overwritten
    assert final.version == N_WRITERS
    assert set(final.committed_batches()) == {1_000 + i for i in range(N_WRITERS)}


def test_replay_retries_after_concurrent_commit(spark, tmp_path):
    """A replay holding a stale handle must survive another writer's
    interleaved commit: the conflicted chunk reloads and re-applies
    against the fresh base instead of failing or clobbering it."""
    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    stale = LakeTable.load(root)  # version 0
    # another writer wins a commit while `stale` is in hand
    other = LakeTable.load(root)
    other.commit({}, set(), (777, {"lsn_lo": -1, "lsn_hi": -1, "rows_applied": 0}))

    events = gen_events(spark, n_events=4_000, n_keys=400)
    res = replay(spark, events, stale, chunk_size=2_000)
    assert res["batches_applied"] == 2

    final = LakeTable.load(root)
    assert final.is_committed(0) and final.is_committed(1) and final.is_committed(777)
    # state equals a clean single-writer replay
    clean_root = str(tmp_path / "clean")
    clean = LakeTable.create(clean_root, n_buckets=8)
    replay(spark, events, clean, chunk_size=2_000)
    got = sorted(tuple(r) for r in final.read(spark).collect())
    want = sorted(tuple(r) for r in LakeTable.load(clean_root).read(spark).collect())
    assert got == want


def test_racing_mor_and_cow_replayers_converge(spark, tmp_path):
    """Two replayers race over the SAME stream with DIFFERENT write
    modes — one appending merge-on-read deltas, one rewriting buckets
    copy-on-write. The commit lock + fork guard + manifest must give
    exactly-once per chunk across both, and the mixed COW/MOR layout
    that results must read back as the clean single-writer state
    (write modes are a physical choice, never a semantic one)."""
    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    events = gen_events(spark, n_events=4_000, n_keys=300).cache()
    events.count()

    errors: list[Exception] = []
    start = threading.Barrier(2)

    def run(mode: str) -> None:
        try:
            start.wait()
            # replay is resumable: a racer that exhausts its bounded
            # conflict retries re-enters from the manifest (already-
            # committed chunks are skipped, never re-applied)
            for _ in range(6):
                try:
                    res = replay(
                        spark,
                        events,
                        LakeTable.load(root),
                        chunk_size=1_000,
                        write_mode=mode,
                    )
                except RuntimeError as exc:
                    if "fork/rewind" not in str(exc):
                        raise
                    continue
                if res["batches_applied"] == 0:
                    break
        except Exception as exc:
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(m,)) for m in ("mor", "cow")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
        assert not t.is_alive(), "racer hung"
    assert not errors, errors

    final = LakeTable.load(root)
    assert all(final.is_committed(i) for i in range(4))
    # exactly-once lives in the manifest: nothing is left to apply
    leftover = replay(spark, events, LakeTable.load(root), chunk_size=1_000)
    assert leftover["batches_applied"] == 0

    clean_root = str(tmp_path / "clean")
    replay(spark, events, LakeTable.create(clean_root, n_buckets=8), chunk_size=1_000)
    got = sorted(tuple(r) for r in final.read(spark).collect())
    want = sorted(tuple(r) for r in LakeTable.load(clean_root).read(spark).collect())
    assert got == want


def test_replay_recomputes_stats_after_concurrent_shrink_rebucket(spark, tmp_path):
    """The documented silent-data-loss scenario, end-to-end: a
    rebucket() commits between a replay's upfront stats pass and its
    chunk commits. The stale handle's precomputed _bucket ids address
    the OLD layout — without the layout guard (apply.py) + recompute
    (replay.py) the merge would replace new-layout buckets built from a
    PARTIAL base and silently drop the unread keys of every replaced
    bucket. The fork/rewind retry must reload, see n_buckets changed,
    recompute the stats, and land on exactly the clean-replay state."""
    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    events = gen_events(spark, n_events=4_000, n_keys=300).cache()
    events.count()

    # seed some base state so the rebucket has buckets to move
    replay(spark, events, LakeTable.load(root), chunk_size=1_000, max_batches=1)

    stale = LakeTable.load(root)  # sees 8 buckets, batch 0 committed
    # the interleaved maintenance commit: layout 8 -> 5 (a SHRINK, the
    # direction where stale new-layout/old-layout id confusion is
    # guaranteed to alias distinct buckets)
    LakeTable.load(root).rebucket(spark, 5)

    # the stale replay computes its upfront stats under n_buckets=8,
    # then every chunk commit forks against the rebucket's version
    res = replay(spark, events, stale, chunk_size=1_000)
    assert res["batches_applied"] == 3  # chunks 1-3 (0 was committed)

    final = LakeTable.load(root)
    assert final.n_buckets == 5
    assert all(final.is_committed(i) for i in range(4))

    clean_root = str(tmp_path / "clean")
    replay(spark, events, LakeTable.create(clean_root, n_buckets=5), chunk_size=1_000)
    got = sorted(tuple(r) for r in final.read(spark).collect())
    want = sorted(tuple(r) for r in LakeTable.load(clean_root).read(spark).collect())
    assert got == want


def test_racing_rebucket_against_live_replay_converges(spark, tmp_path):
    """True thread race: rebucket() fires WHILE a multi-chunk replay is
    running (triggered the moment the replay's first chunk lands). Both
    sides retry their fork/rewind losses; whatever interleaving the
    scheduler picks, the final table must carry the new layout, every
    chunk exactly once, and the clean-replay state."""
    import time

    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    events = gen_events(spark, n_events=8_000, n_keys=400).cache()
    events.count()

    errors: list[Exception] = []

    def replayer() -> None:
        try:
            for _ in range(8):
                try:
                    replay(spark, events, LakeTable.load(root), chunk_size=1_000)
                    return
                except RuntimeError as exc:
                    if "fork/rewind" not in str(exc):
                        raise
        except Exception as exc:
            errors.append(exc)

    def rebucketer() -> None:
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if LakeTable.load(root).committed_batches():
                    break
                time.sleep(0.01)
            while True:
                try:
                    LakeTable.load(root).rebucket(spark, 5)
                    return
                except RuntimeError as exc:
                    if "fork/rewind" not in str(exc):
                        raise
        except Exception as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=replayer),
        threading.Thread(target=rebucketer),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(300)
        assert not t.is_alive(), "racer hung"
    assert not errors, errors

    final = LakeTable.load(root)
    assert final.n_buckets == 5
    assert all(final.is_committed(i) for i in range(8))
    leftover = replay(spark, events, LakeTable.load(root), chunk_size=1_000)
    assert leftover["batches_applied"] == 0

    clean_root = str(tmp_path / "clean")
    replay(spark, events, LakeTable.create(clean_root, n_buckets=5), chunk_size=1_000)
    got = sorted(tuple(r) for r in final.read(spark).collect())
    want = sorted(tuple(r) for r in LakeTable.load(clean_root).read(spark).collect())
    assert got == want


def test_disjoint_cow_conflict_rebases_without_recompute(spark, tmp_path):
    """Validation-based OCC (apply.py _commit_validated): a COW apply
    whose commit loses the race to a writer that touched DISJOINT
    buckets re-issues its commit on the fresh head — the written dirs
    are still valid — instead of recomputing the merge."""
    from pyspark.sql import functions as F

    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.cdc.table import bucket_expr
    from medallion_etl_spark.synth import gen_events

    from .cdc_oracle import assert_frames_equal, expected_final_state

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=2_000, n_keys=300, with_evolution=False)
    left = ev.filter(bucket_expr("doc_id", 8) < 4).filter("lsn < 1000")
    right = ev.filter(bucket_expr("doc_id", 8) >= 4).filter("lsn >= 1000")

    stale = LakeTable.load(root)  # version 0 handle
    apply_batch(spark, LakeTable.load(root), right, batch_id=2, lsn_lo=1_000, lsn_hi=1_999)
    res = apply_batch(
        spark, stale, left, batch_id=1, lsn_lo=0, lsn_hi=999, allow_rebase=True
    )
    assert res["commit_rebased"] is True

    final = LakeTable.load(root)
    assert final.is_committed(1) and final.is_committed(2)
    both = left.unionByName(right).toPandas()
    got = final.read(spark).toPandas()
    exp = expected_final_state(both)
    assert_frames_equal(got, exp[[c for c in exp.columns if c in got.columns]])


def test_overlapping_cow_conflict_still_recomputes(spark, tmp_path):
    """A concurrent write to one of OUR buckets invalidates the merge
    output (it consumed that bucket's old contents) — the rebase must
    refuse and surface the fork/rewind error for the recompute retry."""
    import pytest as _pytest

    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.cdc.table import bucket_expr
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=2_000, n_keys=300, with_evolution=False)
    first = ev.filter(bucket_expr("doc_id", 8) < 4).filter("lsn < 1000")
    second = ev.filter(bucket_expr("doc_id", 8) < 4).filter("lsn >= 1000")

    stale = LakeTable.load(root)
    apply_batch(spark, LakeTable.load(root), first, batch_id=2, lsn_lo=0, lsn_hi=999)
    with _pytest.raises(RuntimeError, match="fork/rewind"):
        apply_batch(
            spark, stale, second, batch_id=1, lsn_lo=1_000, lsn_hi=1_999,
            allow_rebase=True,
        )


def test_mor_append_rebases_even_on_the_same_bucket(spark, tmp_path):
    """Delta appends are self-contained chunk data and the read fold is
    order-independent, so a MOR commit rebases across ANY concurrent
    change — including a COW rewrite of the very buckets it appends
    to — and the folded state still equals the LWW oracle."""
    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.synth import gen_events

    from .cdc_oracle import assert_frames_equal, expected_final_state

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=3_000, n_keys=200, with_evolution=False)
    base = ev.filter("lsn < 1000")
    mid = ev.filter("lsn >= 1000 AND lsn < 2000")
    tail = ev.filter("lsn >= 2000")
    apply_batch(spark, LakeTable.load(root), base, batch_id=0, lsn_lo=0, lsn_hi=999)

    stale = LakeTable.load(root)  # version 1 handle
    # a COW writer rewrites (potentially all) buckets concurrently...
    apply_batch(spark, LakeTable.load(root), mid, batch_id=1, lsn_lo=1_000, lsn_hi=1_999)
    # ...the MOR append on the stale handle must rebase, not recompute
    res = apply_batch(
        spark, stale, tail, batch_id=2, lsn_lo=2_000, lsn_hi=2_999,
        write_mode="mor", allow_rebase=True,
    )
    assert res["write_mode"] == "mor" and res["commit_rebased"] is True

    final = LakeTable.load(root)
    got = final.read(spark).toPandas()
    exp = expected_final_state(ev.toPandas())
    assert_frames_equal(got, exp[[c for c in exp.columns if c in got.columns]])


def test_rebase_is_opt_in(spark, tmp_path):
    """The rebase is only correct for chunks whose content is
    independent of table state, so callers must OPT IN (replay and
    streaming epochs do). The default path — what DML, redrive and
    MERGE INTO use, since their chunks are derived from a snapshot —
    must keep raising fork/rewind for the recompute retry even on a
    perfectly disjoint conflict."""
    import pytest as _pytest

    from medallion_etl_spark.cdc.apply import apply_batch
    from medallion_etl_spark.cdc.table import bucket_expr
    from medallion_etl_spark.synth import gen_events

    root = str(tmp_path / "t")
    LakeTable.create(root, n_buckets=8)
    ev = gen_events(spark, n_events=1_000, n_keys=200, with_evolution=False)
    left = ev.filter(bucket_expr("doc_id", 8) < 4).filter("lsn < 500")
    right = ev.filter(bucket_expr("doc_id", 8) >= 4).filter("lsn >= 500")

    stale = LakeTable.load(root)
    apply_batch(spark, LakeTable.load(root), right, batch_id=2, lsn_lo=500, lsn_hi=999)
    with _pytest.raises(RuntimeError, match="fork/rewind"):
        apply_batch(spark, stale, left, batch_id=1, lsn_lo=0, lsn_hi=499)
