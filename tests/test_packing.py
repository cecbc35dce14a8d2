"""Concat-and-cut sequence packing: closed form matches a sequential
replay, conservation holds, and the plan is one exchange + one window."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from medallion_etl_spark.operators.packing import TOKEN_BUDGET, chunk_assign, packed_sequences

SF = "/root/testdata/sf0.001"


def _replay(sizes, budget):
    """Sequential concat-and-cut: walk docs in order, track the running
    offset, record the chunk each doc STARTS in."""
    out, offset = [], 0
    for s in sizes:
        out.append(offset // budget)
        offset += s
    return out


def test_matches_sequential_replay(spark):
    rng = random.Random(3)
    rows = [
        (k, i, rng.choice([5, 40, 900, 2048, 5000]))
        for k in range(4)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "k long, i long, n_tok long")
    got = {
        (r["k"], r["i"]): r["chunk_seq"]
        for r in chunk_assign(df, ["k"], "i", "n_tok", 1000).collect()
    }
    for k in range(4):
        sizes = [s for kk, _, s in rows if kk == k]
        expect = _replay(sizes, 1000)
        for i, chunk in enumerate(expect):
            assert got[(k, i)] == chunk, (k, i)


def test_conservation_and_chunk_density(spark):
    out = packed_sequences(spark, SF).toPandas()
    docs_total = out["n_docs"].sum()
    from medallion_etl_spark.sources.readers import load_table as T

    assert docs_total == T(spark, SF, "documents").count()
    # every chunk below a source's last holds >= budget's worth of
    # starts-or-straddle: chunk_seq per source is gapless 0..max
    for src, grp in out.groupby("source"):
        seqs = sorted(grp["chunk_seq"])
        assert seqs == list(range(len(seqs))), src


def test_one_exchange_one_window(spark):
    df = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("i"), F.lit(100).alias("n_tok")
    )
    plan = chunk_assign(df, ["k"], "i", "n_tok", 1000)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert plan.count("Window") == 1, plan
