"""As-of join: equivalence with a brute-force per-row oracle, and the
plan property the operator exists for — NO join node, one hash
exchange (union + carry-forward window, no candidate explosion)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from medallion_etl_spark.operators.asof import asof_attribution, asof_join


def _brute(lefts, rights):
    # newest right with right.ts <= left.ts per key; ties -> max tiebreak
    out = {}
    for lid, key, lts in lefts:
        best = None
        for rid, rkey, rts in rights:
            if rkey == key and rts <= lts and (best is None or (rts, rid) > best):
                best = (rts, rid)
        out[lid] = best[1] if best else None
    return out


def test_asof_join_matches_brute_force(spark):
    rng = random.Random(7)
    lefts = [(i, rng.randrange(5), rng.randrange(100)) for i in range(80)]
    rights = [(1000 + i, rng.randrange(5), rng.randrange(100)) for i in range(60)]
    ldf = spark.createDataFrame(lefts, "lid long, k long, lts long")
    rdf = spark.createDataFrame(rights, "rid long, k long, rts long")
    got = asof_join(
        ldf, rdf, keys=["k"], left_ts="lts", right_ts="rts",
        payload=["rid"], tiebreak="rid",
    )
    assert {r["lid"]: r["rid"] for r in got.collect()} == _brute(lefts, rights)


def test_asof_join_no_rows_lost_or_duplicated(spark):
    ldf = spark.range(500).select(
        F.col("id").alias("lid"), (F.col("id") % 7).alias("k"), F.col("id").alias("lts")
    )
    rdf = spark.range(3).select(
        (F.col("id") + 900).alias("rid"), F.col("id").alias("k"), F.lit(0).alias("rts")
    )
    got = asof_join(ldf, rdf, ["k"], "lts", "rts", ["rid"], "rid")
    assert got.count() == 500
    # keys 3..6 have no right rows at all -> NULL payload, rows kept
    assert got.filter("k >= 3").filter("rid IS NOT NULL").count() == 0


def test_asof_plan_has_no_join_node(spark, sf_small):
    """The whole point of the union+window formulation: hot keys cannot
    explode because no join (hence no candidate pairing) ever happens,
    and the only wide exchange is the window's hash partitioning."""
    import contextlib, io

    df = asof_attribution(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    assert "Join" not in p
    # one hash exchange (the window's); the only other is the final
    # orderBy's rangepartitioning
    assert p.count("hashpartitioning") == 1
    assert "Window" in p
