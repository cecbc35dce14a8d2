"""Property tests (hypothesis) for the pure-Python replay planning:
chunk plans partition the LSN range exactly, are stable across resumes,
and pending-chunk filtering matches the committed set."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from medallion_etl_spark.cdc.manifest import plan_chunks

pytestmark = pytest.mark.smoke


@settings(max_examples=200, deadline=None)
@given(
    lo=st.integers(min_value=-(10**9), max_value=10**9),
    span=st.integers(min_value=0, max_value=10**5),
    chunk=st.integers(min_value=1, max_value=10**6),
)
def test_plan_chunks_partitions_range_exactly(lo, span, chunk):
    hi = lo + span
    chunks = plan_chunks(lo, hi, chunk)
    assert chunks[0][1] == lo and chunks[-1][2] == hi
    # contiguous, non-overlapping, ids dense from 0
    for i, (bid, clo, chi) in enumerate(chunks):
        assert bid == i and clo <= chi
        if i:
            assert clo == chunks[i - 1][2] + 1
    # every chunk except the last is exactly chunk_size wide
    for _bid, clo, chi in chunks[:-1]:
        assert chi - clo + 1 == chunk


@given(
    lo=st.integers(min_value=0, max_value=10**6),
    span=st.integers(min_value=0, max_value=10**5),
    chunk=st.integers(min_value=1, max_value=10**4),
)
def test_plan_is_deterministic(lo, span, chunk):
    assert plan_chunks(lo, lo + span, chunk) == plan_chunks(lo, lo + span, chunk)


class FakeTable:
    """committed = {batch_id: (lsn_lo, lsn_hi)}"""

    def __init__(self, committed):
        self._c = committed

    def committed_batches(self):
        return {b: {"lsn_lo": lo, "lsn_hi": hi} for b, (lo, hi) in self._c.items()}


def test_pending_chunks_skips_committed():
    from medallion_etl_spark.cdc.manifest import pending_chunks

    chunks = plan_chunks(0, 99, 25)
    done = {0: (0, 24), 2: (50, 74)}
    assert [c[0] for c in pending_chunks(FakeTable(done), chunks)] == [1, 3]
    all_done = {i: (i * 25, i * 25 + 24) for i in range(4)}
    assert pending_chunks(FakeTable(all_done), chunks) == []


def test_pending_chunks_raises_on_moved_window():
    """A committed id re-planned with a DIFFERENT LSN range means the
    stream window moved (yesterday's extract consumed, today's tail fed
    alone): silently skipping it would drop today's events forever."""
    import pytest

    from medallion_etl_spark.cdc.manifest import pending_chunks

    # yesterday: events 0..99 in 25-chunks; today: only events 100..199
    # are fed, so chunk 0 re-plans as [100, 124]
    done = {i: (i * 25, i * 25 + 24) for i in range(4)}
    today = plan_chunks(100, 199, 25)
    with pytest.raises(RuntimeError, match="window moved"):
        pending_chunks(FakeTable(done), today)

    # a tail grown INTO a partially-filled committed chunk is the same
    # hazard: chunk 3 committed as [75, 90] when the stream ended at
    # 90; after growth the plan says [75, 99] — rows 91..99 would
    # vanish inside the skipped chunk
    done_partial = {**{i: (i * 25, i * 25 + 24) for i in range(3)}, 3: (75, 90)}
    grown = plan_chunks(0, 120, 25)
    with pytest.raises(RuntimeError, match="window moved"):
        pending_chunks(FakeTable(done_partial), grown)

    # a grown tail after a FULL last chunk is fine: old chunks re-plan
    # with identical ranges, only the new chunk is pending
    assert [c[0] for c in pending_chunks(FakeTable(done), grown)] == [4]


def test_plan_chunks_rejects_nonpositive_chunk_size():
    import pytest

    from medallion_etl_spark.cdc.manifest import plan_chunks

    with pytest.raises(ValueError, match="chunk_size"):
        plan_chunks(0, 100, 0)
    with pytest.raises(ValueError, match="chunk_size"):
        plan_chunks(0, 100, -5)
