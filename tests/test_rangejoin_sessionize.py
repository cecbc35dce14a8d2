"""Range join: brute-force equivalence (intervals spanning many grain
cells, exactly-once matches) and the plan property it exists for — an
equi-join, never BroadcastNestedLoopJoin. Sessionization: known-gap
unit check."""

from __future__ import annotations

import contextlib
import io
import random
import datetime

from pyspark.sql import functions as F

from medallion_etl_spark.operators.rangejoin import range_join, view_purchase_range_join
from medallion_etl_spark.operators.sessionize import sessionize


def test_range_join_matches_brute_force(spark):
    rng = random.Random(11)
    points = [(i, rng.randrange(3), rng.randrange(1000)) for i in range(120)]
    # interval lengths 1..400 at grain 50: cells-per-interval 1..9
    ivals = []
    for i in range(60):
        s = rng.randrange(1000)
        ivals.append((1000 + i, rng.randrange(3), s, s + 1 + rng.randrange(400)))
    pdf = spark.createDataFrame(points, "pid long, k long, t long")
    idf = spark.createDataFrame(ivals, "iid long, k long, s long, e long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pdf, idf, ["k"], "t", "s", "e", grain=50).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, pk, t in points
        for iid, ik, s, e in ivals
        if pk == ik and s <= t < e
    )
    assert got == want  # exactly-once: no misses, no dup matches


def test_range_join_plans_as_equi_join(spark, sf_small):
    df = view_purchase_range_join(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    assert "NestedLoop" not in p and "CartesianProduct" not in p
    assert "Join" in p  # a real keyed join on (user_id, _cell)


def test_sessionize_splits_at_gap(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base),
        (1, base + datetime.timedelta(minutes=10)),   # same session
        (1, base + datetime.timedelta(minutes=50)),   # 40min gap -> new
        (1, base + datetime.timedelta(minutes=55)),   # same
        (2, base),                                    # other user: own seq
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_seq"]
        for r in sessionize(df, "user_id", "ts").collect()
    }
    assert got == {(1, 0): 1, (1, 10): 1, (1, 50): 2, (1, 55): 2, (2, 0): 1}
