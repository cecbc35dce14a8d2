"""Sliding-window chunking: closed form matches a sequential replay,
coverage/overlap invariants hold, and the plan is map-only (no
exchange, no join, no Python)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from medallion_etl_spark.operators.chunking import (
    STRIDE,
    WINDOW,
    chunk_spans,
    doc_chunk_inventory,
)

SF = "/root/testdata/sf0.001"


def _replay(n_tok, window, stride):
    """Sequential reference: start chunks every `stride` tokens until a
    chunk covers the last token."""
    spans, start = [], 0
    while True:
        length = min(window, n_tok - start)
        spans.append((start, length))
        if start + window >= n_tok:
            return spans
        start += stride


def test_matches_sequential_replay(spark):
    rng = random.Random(7)
    # include the edge shapes: shorter than window, exact window, exact
    # multiple-of-stride overhang, and one-past boundaries
    sizes = [1, 5, WINDOW - 1, WINDOW, WINDOW + 1, WINDOW + STRIDE,
             WINDOW + STRIDE + 1, 2 * WINDOW, 997] + [
        rng.randint(1, 400) for _ in range(50)
    ]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc long, n_tok long"
    )
    got = {}
    for r in chunk_spans(df, "n_tok", WINDOW, STRIDE).collect():
        got.setdefault(r["doc"], []).append(
            (r["chunk_idx"], r["tok_start"], r["chunk_tokens"], r["is_tail"])
        )
    for i, n in enumerate(sizes):
        expect = _replay(n, WINDOW, STRIDE)
        rows = sorted(got[i])
        assert len(rows) == len(expect), (i, n)
        for k, (start, length) in enumerate(expect):
            idx, tok_start, chunk_tokens, is_tail = rows[k]
            assert idx == k and tok_start == start and chunk_tokens == length, (i, n, k)
            assert is_tail == (1 if k == len(expect) - 1 else 0), (i, n, k)


def test_coverage_and_overlap(spark):
    out = doc_chunk_inventory(spark, SF).toPandas()
    assert len(out) > 0
    for doc, grp in out.groupby("doc_id"):
        grp = grp.sort_values("chunk_idx").reset_index(drop=True)
        # gapless chunk ids, exactly one tail, and every token covered:
        # chunk k starts at k*STRIDE and the tail reaches the last token
        assert list(grp["chunk_idx"]) == list(range(len(grp))), doc
        assert grp["is_tail"].sum() == 1 and grp["is_tail"].iloc[-1] == 1, doc
        assert (grp["tok_start"] == grp["chunk_idx"] * STRIDE).all(), doc
        assert (grp["chunk_tokens"] >= 1).all(), doc
        last = grp.iloc[-1]
        n_tok = last["tok_start"] + last["chunk_tokens"]
        # non-tail chunks are full WINDOW; consecutive starts differ by STRIDE
        assert (grp["chunk_tokens"][:-1] == WINDOW).all(), doc
        assert last["tok_start"] + WINDOW >= n_tok, doc


def test_map_only_plan(spark):
    df = spark.range(1000).select(
        F.col("id").alias("doc"), (F.col("id") % 200 + 1).alias("n_tok")
    )
    plan = (
        chunk_spans(df, "n_tok", WINDOW, STRIDE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan
    assert "Python" not in plan, plan
    assert "Generate" in plan, plan  # the explode
