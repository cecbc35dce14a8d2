"""Property tests (hypothesis) for the pure-Python replay planning:
chunk plans partition the LSN range exactly, are stable across resumes,
and pending-chunk filtering matches the committed set."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from medallion_etl_spark.cdc.manifest import plan_chunks


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


def test_pending_chunks_skips_committed():
    class FakeTable:
        def __init__(self, committed):
            self._c = committed

        def is_committed(self, bid):
            return bid in self._c

    from medallion_etl_spark.cdc.manifest import pending_chunks

    chunks = plan_chunks(0, 99, 25)
    assert [c[0] for c in pending_chunks(FakeTable({0, 2}), chunks)] == [1, 3]
    assert pending_chunks(FakeTable({0, 1, 2, 3}), chunks) == []
