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


# --------------------------------------------------------------------------
# packed-batch payload materialization


def _brute_payloads(docs, budget, vocab):
    """Python oracle: per (source, pack) the exact token-id CSV."""
    import hashlib

    def tok(w):
        h = hashlib.md5(w.encode()).hexdigest()
        acc = ord(h[0])
        for c in h[1:5]:
            acc = acc * 31 + ord(c)
        return acc % vocab

    by_src = {}
    for doc_id, source, text in sorted(docs):
        ids = [tok(w) for w in text.lower().split(" ") if w]
        if ids:
            by_src.setdefault(source, []).append(ids)
    out = {}
    for src, streams in by_src.items():
        flat = [t for ids in streams for t in ids]
        for p in range(0, len(flat), budget):
            out[(src, p // budget)] = ",".join(map(str, flat[p : p + budget]))
    return out


def test_payloads_match_python_oracle(spark):
    from medallion_etl_spark.operators import packing
    from medallion_etl_spark.operators.repetition import VOCAB_SIZE

    rng = random.Random(11)
    vocab_words = [f"tok{i}" for i in range(50)]
    docs = [
        (i, f"s{i % 3}", " ".join(rng.choice(vocab_words) for _ in range(rng.randint(1, 700))))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    import hashlib
    from unittest import mock

    with mock.patch.object(packing, "T", lambda s, sf, t: df):
        rows = packing.packed_batch_payloads(spark, "ignored").collect()
    expect = _brute_payloads(docs, packing.TOKEN_BUDGET, VOCAB_SIZE)
    assert {(r.source, r.pack_id) for r in rows} == set(expect)
    for r in rows:
        want = expect[(r.source, r.pack_id)]
        assert r.payload_md5 == hashlib.md5(want.encode()).hexdigest(), (
            r.source,
            r.pack_id,
        )
        assert r.n_tokens == want.count(",") + 1


def test_payloads_fixed_length_and_conservation(spark):
    from medallion_etl_spark.operators.packing import packed_batch_payloads

    pdf = packed_batch_payloads(spark, SF).toPandas()
    last = pdf.groupby("source")["pack_id"].transform("max")
    assert (pdf.loc[pdf.pack_id < last, "n_tokens"] == TOKEN_BUDGET).all()
    from medallion_etl_spark.sources.readers import load_table as T

    n_tok_total = (
        T(spark, SF, "documents")
        .select(
            F.size(
                F.filter(F.split(F.lower("text"), " "), lambda w: F.length(w) > 0)
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert int(pdf.n_tokens.sum()) == n_tok_total


def test_payloads_single_exchange_no_join(spark):
    from medallion_etl_spark.operators.packing import packed_batch_payloads

    plan = (
        packed_batch_payloads(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    # the prefix-sum window's source exchange is reused by the pack
    # group-by (clustered on a superset of the same key); the final
    # orderBy adds a range exchange and spread() a round-robin one
    body = "\n".join(
        l
        for l in plan.splitlines()
        if "rangepartitioning" not in l and "RoundRobinPartitioning" not in l
    )
    assert body.count("Exchange") == 1, plan
