"""SCD2-from-changes: span compression, tombstone close/reopen, and
equivalence with a brute-force per-key replay."""

from __future__ import annotations

import datetime
import random

from medallion_etl_spark.operators.scd import scd2_history

BASE = datetime.datetime(2024, 1, 1)


def _mk(spark, rows):
    # rows: (key, lsn, attr) -> ts derived from lsn so spans are checkable
    data = [(k, lsn, attr, BASE + datetime.timedelta(minutes=lsn)) for k, lsn, attr in rows]
    return spark.createDataFrame(data, "k long, lsn long, attr string, ts timestamp")


def _hist(spark, rows, tombstone="DEL"):
    df = _mk(spark, rows)
    got = scd2_history(df, "k", "attr", "lsn", "ts", tombstone=tombstone)
    return sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in got.collect()
    )


def _ts(lsn):
    return BASE + datetime.timedelta(minutes=lsn)


def test_consecutive_same_attr_compress_into_one_span(spark):
    rows = [(1, 0, "a"), (1, 1, "a"), (1, 2, "a"), (1, 3, "b"), (1, 4, "b")]
    assert _hist(spark, rows) == [
        (1, "a", _ts(0), _ts(3), 0),
        (1, "b", _ts(3), None, 1),
    ]


def test_tombstone_closes_span_and_reopen_starts_new_one(spark):
    # a -> DEL -> a: the delete closes the first span; the SAME value
    # afterwards must open a fresh span (null-safe lag over tombstones).
    rows = [(1, 0, "a"), (1, 1, "DEL"), (1, 2, "a")]
    assert _hist(spark, rows) == [
        (1, "a", _ts(0), _ts(1), 0),
        (1, "a", _ts(2), None, 1),
    ]


def test_key_ending_in_tombstone_has_no_current_row(spark):
    rows = [(1, 0, "a"), (1, 1, "DEL"), (2, 0, "x")]
    hist = _hist(spark, rows)
    assert hist == [
        (1, "a", _ts(0), _ts(1), 0),
        (2, "x", _ts(0), None, 1),
    ]


def test_matches_brute_force_replay(spark):
    rng = random.Random(11)
    rows = []
    lsn = 0
    for _ in range(400):
        k = rng.randrange(8)
        attr = rng.choice(["a", "b", "c", "DEL"])
        rows.append((k, lsn, attr))
        lsn += 1

    # brute force: replay per key, record change-point spans
    expect = []
    for k in range(8):
        seq = [(lsn, attr) for kk, lsn, attr in rows if kk == k]
        spans = []
        prev = None
        for lsn_, attr in seq:
            if prev is None or attr != prev:
                spans.append([attr, lsn_, None])
                prev = attr
        for i in range(len(spans) - 1):
            spans[i][2] = spans[i + 1][1]
        for attr, start, end in spans:
            if attr == "DEL":
                continue
            expect.append(
                (k, attr, _ts(start), _ts(end) if end is not None else None,
                 1 if end is None else 0)
            )
    assert _hist(spark, rows) == sorted(expect)


def test_single_exchange_feeds_both_windows(spark):
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "c")]
    df = _mk(spark, rows)
    plan = scd2_history(df, "k", "attr", "lsn", "ts")._jdf.queryExecution().executedPlan().toString()
    # exactly one shuffle for the whole history build (both windows
    # share the per-key partitioning; no join anywhere)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
