"""Learned-BPE drop-in proof (VERDICT r4 task 6, operators/bpe.py).

The claim under test: a production (learned) tokenizer slots into the
engine through the documented Arrow-batched ``mapInPandas`` path
WITHOUT touching the query contract — same output schema as
``tokenize_documents_raw``, per-row semantics independent of Spark's
batching/partitioning, exact equality with a pure-Python mirror.

The fixture (tests/fixtures/bpe_toy.json) is a genuinely TRAINED
tokenizer: train_bpe over the sf0.001 corpus, 40 merges (the 31-word
synthetic vocabulary saturates at 93 — 40 keeps typical words
multi-token so the greedy-merge encode path actually exercises).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from medallion_etl_spark.operators.bpe import (
    EOW,
    UNK_ID,
    decode_tokens,
    encode_text,
    encode_word,
    load_spec,
    tokenize_documents_bpe,
    train_bpe,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bpe_toy.json")


@pytest.fixture(scope="module")
def spec() -> dict:
    return load_spec(FIXTURE)


@pytest.fixture(scope="module")
def ranks(spec) -> dict:
    return {tuple(m): i for i, m in enumerate(spec["merges"])}


def test_fixture_is_reproducible_from_its_provenance(spec):
    """The vendored file is exactly what train_bpe produces — no hand
    edits, no drift between trainer and fixture."""
    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    fresh = train_bpe(texts, 40)
    assert fresh["merges"] == spec["merges"]
    assert fresh["vocab"] == spec["vocab"]


def test_greedy_encode_matches_apply_in_learned_order(spec, ranks):
    """Independent mirror of the encoder: the classical formulation
    applies merges in LEARNED order, each exhaustively; encode_word
    picks the lowest-rank adjacent pair iteratively. They must agree on
    every corpus word (they are equivalent for merge tables whose
    creation order respects symbol dependencies — a regression here
    means the encoder broke)."""
    import duckdb

    def classical(word: str) -> list[int]:
        seq = list(word)
        seq[-1] = seq[-1] + EOW
        for a, b in (tuple(m) for m in spec["merges"]):
            out: list[str] = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            seq = out
        return [spec["vocab"].get(s, UNK_ID) for s in seq]

    words = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT w FROM ("
            "  SELECT unnest(string_split(lower(text), ' ')) AS w"
            "  FROM '/root/testdata/sf0.001/documents.parquet'"
            ") WHERE length(w) > 0"
        ).fetchall()
    ]
    for w in words:
        assert encode_word(w, ranks, spec["vocab"]) == classical(w), w


def test_spark_bpe_equals_python_mirror_and_is_partition_invariant(
    spark, sf_tiny, spec, ranks
):
    from medallion_etl_spark.sources.readers import load_table as T

    docs = T(spark, sf_tiny, "documents")
    pdf = docs.select("doc_id", "text", "source").toPandas()
    cache: dict = {}
    mirror = {
        int(r.doc_id): encode_text(r.text, ranks, spec["vocab"], cache)
        for r in pdf.itertuples()
    }

    for reparted in (docs, docs.repartition(7)):
        got = tokenize_documents_bpe(reparted, spec).collect()
        assert len(got) == len(mirror)
        for row in got:
            toks = list(row.tokens)
            assert toks == mirror[row.doc_id], row.doc_id
            assert row.n_tok == len(toks)


def test_bpe_output_schema_is_the_tokenizer_contract(spark, sf_tiny, spec):
    """Drop-in means drop-in: identical schema (names, types,
    nullability aside) to tokenize_documents_raw, so packing/
    chunking/decontamination consumers cannot tell which tokenizer
    produced their input."""
    from medallion_etl_spark.operators.repetition import tokenize_documents_raw
    from medallion_etl_spark.sources.readers import load_table as T

    hash_schema = tokenize_documents_raw(spark, sf_tiny).schema
    bpe_schema = tokenize_documents_bpe(T(spark, sf_tiny, "documents"), spec).schema
    assert [(f.name, f.dataType.simpleString()) for f in bpe_schema] == [
        (f.name, f.dataType.simpleString()) for f in hash_schema
    ]


def test_bpe_roundtrip_recovers_normalized_text(spark, sf_tiny, spec):
    """Token sequences decode back to the whitespace-normalized text —
    the property that distinguishes a real tokenizer from a hash vocab
    (ids carry the text, not just a fingerprint)."""
    from medallion_etl_spark.sources.readers import load_table as T

    docs = T(spark, sf_tiny, "documents")
    out = tokenize_documents_bpe(docs, spec).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    for row in out.collect():
        want = " ".join(w for w in row.text.lower().split(" ") if w)
        assert decode_tokens(list(row.tokens), spec["vocab"]) == want


@pytest.mark.parametrize("n_merges", [0, 5, 200])
def test_bpe_roundtrip_property_over_random_corpora(n_merges):
    """Hypothesis property: for ANY corpus and ANY merge budget,
    decode(encode(text)) recovers the whitespace-normalized text for
    every trained-on document (all symbols in-vocab by construction),
    ids are dense from 1, and the merge count respects the budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcxyz", min_size=1, max_size=6)
    corpus = st.lists(
        st.lists(words, min_size=1, max_size=8).map(" ".join),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=30, deadline=None)
    @given(texts=corpus)
    def check(texts):
        spec = train_bpe(texts, n_merges)
        assert len(spec["merges"]) <= n_merges
        ids = sorted(spec["vocab"].values())
        assert ids == list(range(1, len(ids) + 1)), "ids must be dense from 1"
        ranks = {tuple(m): i for i, m in enumerate(spec["merges"])}
        cache: dict = {}
        for t in texts:
            want = " ".join(w for w in t.lower().split(" ") if w)
            got = decode_tokens(
                encode_text(t, ranks, spec["vocab"], cache), spec["vocab"]
            )
            assert got == want, (t, got, want)

    check()


def test_oov_symbols_map_to_unk(spark, spec):
    df = spark.createDataFrame(
        [(1, "stream zzz9 batch", "s"), (2, "@@@@", "s")],
        "doc_id long, text string, source string",
    )
    rows = {r.doc_id: list(r.tokens) for r in tokenize_documents_bpe(df, spec).collect()}
    ranks = {tuple(m): i for i, m in enumerate(spec["merges"])}
    stream = encode_word("stream", ranks, spec["vocab"])
    batch = encode_word("batch", ranks, spec["vocab"])
    assert rows[1][: len(stream)] == stream
    assert rows[1][-len(batch):] == batch
    mid = rows[1][len(stream):-len(batch)]
    assert mid and all(t == UNK_ID for t in mid)
    assert rows[2] and all(t == UNK_ID for t in rows[2])
