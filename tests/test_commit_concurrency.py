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
