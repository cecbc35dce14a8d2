"""Hand-computed fixtures for the Gopher-style repetition stats and
the corpus vocabulary top-k (operators/repetition.py). The sf0.01
oracle parity is covered by test_oracle_parity; this pins the exact
fraction semantics on documents small enough to verify by eye."""

from __future__ import annotations

import os

import pytest

from medallion_etl_spark.operators.repetition import (
    doc_repetition_stats,
    vocab_top_words,
)

DOCS = [
    # (doc_id, text): words / 2-grams / top-word fractions worked out below
    (1, "a a b a"),  # n=4, 2 distinct -> dup_word .5; grams {a a, a b, b a} -> dup 0; top a=3/4
    (2, " ".join(f"w{i}" for i in range(20))),  # all distinct: 0 / 0 / 1/20
    (3, "x y x y x y"),  # n=6, 2 distinct -> dup 4/6; grams 5, 2 distinct -> dup 3/5; top 3/6
]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("repdocs"))
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(os.path.join(root, "documents.parquet"))
    return root


def test_repetition_fractions(spark, docs_dir):
    rows = {r["doc_id"]: r for r in doc_repetition_stats(spark, docs_dir).collect()}
    r1, r2, r3 = rows[1], rows[2], rows[3]

    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == 0.5
    assert r1["dup_2gram_frac"] == 0.0
    assert r1["top_word_frac"] == 0.75
    assert not r1["keep"]  # top-word fraction over threshold

    assert r2["dup_word_frac"] == 0.0
    assert r2["dup_2gram_frac"] == 0.0
    assert r2["top_word_frac"] == 0.05
    assert r2["keep"]

    assert r3["dup_word_frac"] == round(4 / 6, 6)
    assert r3["dup_2gram_frac"] == round(3 / 5, 6)
    assert r3["top_word_frac"] == 0.5
    assert not r3["keep"]


def test_vocab_counts_and_order(spark, docs_dir):
    got = vocab_top_words(spark, docs_dir).collect()
    # occurrences: a=3, x=3, y=3, b=1, w0..w19=1 each
    by_word = {r["word"]: (r["n_occurrences"], r["n_docs"]) for r in got}
    assert by_word["a"] == (3, 1)
    assert by_word["x"] == (3, 1)
    assert by_word["b"] == (1, 1)
    # total order: count desc then word asc
    keys = [(-r["n_occurrences"], r["word"]) for r in got]
    assert keys == sorted(keys)
    assert [r["word"] for r in got[:3]] == ["a", "x", "y"]


def test_tokenize_raw_ids_are_bit_exact(spark, docs_dir):
    """Pins the north_star invariant the tokenize docstring claims:
    the raw array<int> token ids match an INDEPENDENT Python
    implementation of the md5 fold bit-for-bit, every id is inside
    [0, VOCAB_SIZE), and the driver-paired string variant is exactly
    the raw array joined with spaces."""
    import hashlib

    from medallion_etl_spark.operators.repetition import (
        VOCAB_SIZE,
        tokenize_documents,
        tokenize_documents_raw,
    )

    def py_token_id(word: str) -> int:
        h = hashlib.md5(word.encode("utf-8")).hexdigest()
        acc = ord(h[0])
        for c in h[1:5]:
            acc = acc * 31 + ord(c)
        return acc % VOCAB_SIZE

    raw = {r["doc_id"]: r for r in tokenize_documents_raw(spark, docs_dir).collect()}
    assert set(raw) == {1, 2, 3}
    for doc_id, text in DOCS:
        words = [w for w in text.lower().split(" ") if w]
        expected = [py_token_id(w) for w in words]
        got = raw[doc_id]["tokens"]
        assert got == expected, f"doc {doc_id}: {got} != {expected}"
        assert raw[doc_id]["n_tok"] == len(expected)
        assert all(0 <= t < VOCAB_SIZE for t in got)

    joined = {
        r["doc_id"]: r["tokens_str"]
        for r in tokenize_documents(spark, docs_dir).collect()
    }
    for doc_id in raw:
        assert joined[doc_id] == " ".join(str(t) for t in raw[doc_id]["tokens"])


def test_token_ngram_decontaminate_invariants(spark, sf_tiny):
    """Value equality vs DuckDB is the driver gate's job; here the
    structural contract: benchmark docs never appear in the output,
    zero-contamination docs DO (left join, unlike the word-level
    operator), and the counts are consistent."""
    from medallion_etl_spark.operators.repetition import (
        TOKEN_DECON_KEEP_MAX,
        token_ngram_decontaminate,
    )

    from medallion_etl_spark.operators.repetition import TOKEN_DECON_K
    from medallion_etl_spark.sources.readers import load_table

    out = token_ngram_decontaminate(spark, sf_tiny).toPandas()
    assert len(out) > 0
    assert not (out["doc_id"] % 20 == 0).any()  # eval suite excluded
    # EVERY non-benchmark doc gets a row — including docs shorter than
    # K tokens (n_ngrams=0, keep=True), the funnel's join contract
    docs = load_table(spark, sf_tiny, "documents").toPandas()
    n_corpus = int((docs["doc_id"] % 20 != 0).sum())
    assert len(out) == n_corpus
    short = out[out["n_ngrams"] == 0]
    assert short["keep"].all() and (short["contam_frac"] == 0).all()
    assert (out["n_contaminated"] <= out["n_ngrams"]).all()
    assert (out["n_contaminated"] == 0).any()  # left join keeps clean docs
    assert ((out["contam_frac"] >= 0) & (out["contam_frac"] <= 1)).all()
    assert (out["keep"] == (out["contam_frac"] <= TOKEN_DECON_KEEP_MAX)).all()


def test_source_token_drift_properties(spark, sf_tiny):
    """Cross-engine values are the driver gate's job; structurally:
    smoothed KL is non-negative (up to the 6-decimal rounding), one
    row per source, token totals positive."""
    from medallion_etl_spark.operators.textops import source_token_drift

    out = source_token_drift(spark, sf_tiny).toPandas()
    assert len(out) > 0 and out["source"].is_unique
    assert (out["n_tokens"] > 0).all()
    assert (out["kl_to_corpus"] >= -1e-6).all()
