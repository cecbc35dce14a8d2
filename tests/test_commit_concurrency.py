"""Optimistic-concurrency commit: racing writers serialize under the
metadata flock; the loser gets RuntimeError and retries from a fresh
load — no commit (batch record or version) is ever lost. Pure
metadata, no Spark session needed."""

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
