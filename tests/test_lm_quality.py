"""Semantic pins for the CCNet-style unigram-LM perplexity filter
(operators/lm_quality.py) on a corpus small enough to reason about by
hand. The sf0.01 value-exact oracle parity is covered by
test_oracle_parity; this checks the LM semantics themselves: OOV-heavy
documents score strictly worse (higher cross-entropy) than documents
made of reference-slice vocabulary, known_frac reflects OOV share
exactly, and bucketing is monotone in cross-entropy."""

from __future__ import annotations

import os

import pytest

from medallion_etl_spark.operators.lm_quality import lm_perplexity_filter

DOCS = [
    # src0 => id % 4 == 0 => inside the LM reference slice
    (1, "the cat sat on the mat", "src0"),
    (2, "the dog sat on the log", "src0"),
    # scored-only sources
    (3, "the cat sat", "src1"),          # all words in-LM
    (4, "zqxv vbnk qwerty", "src1"),     # fully OOV
    (5, "the zqxv cat", "src2"),         # 1/3 OOV
]


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory) -> str:
    root = str(tmp_path_factory.mktemp("lmdocs"))
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.parquet(os.path.join(root, "documents.parquet"))
    return root


def test_lm_scoring_semantics(spark, docs_dir):
    rows = {r["doc_id"]: r for r in lm_perplexity_filter(spark, docs_dir).collect()}
    assert len(rows) == len(DOCS)

    # known_frac is the exact in-LM share of each doc's words
    assert rows[3]["known_frac"] == 1.0
    assert rows[4]["known_frac"] == 0.0
    assert rows[5]["known_frac"] == round(2 / 3, 6)

    # OOV-heavy docs score strictly worse; the partially-OOV doc sits
    # strictly between the fully-known and fully-OOV ones
    assert rows[3]["cross_entropy"] < rows[5]["cross_entropy"] < rows[4]["cross_entropy"]

    # bucket label is monotone in cross-entropy: every head ce <= every
    # middle ce <= every tail ce, and the extremes land where CCNet
    # intends (most in-domain doc in head, fully-OOV doc in tail)
    by_bucket: dict[str, list[float]] = {"head": [], "middle": [], "tail": []}
    for r in rows.values():
        by_bucket[r["ppl_bucket"]].append(r["cross_entropy"])
    assert by_bucket["head"] and by_bucket["tail"]
    lo = max(by_bucket["head"])
    hi = min(by_bucket["tail"])
    assert lo <= hi
    if by_bucket["middle"]:
        assert lo <= min(by_bucket["middle"]) and max(by_bucket["middle"]) <= hi
    assert rows[4]["ppl_bucket"] == "tail"


def test_lm_word_counts(spark, docs_dir):
    # n_words is the whitespace token count (same tokenizer as
    # vocab_top_words / doc_repetition_stats)
    rows = {r["doc_id"]: r for r in lm_perplexity_filter(spark, docs_dir).collect()}
    assert rows[1]["n_words"] == 6
    assert rows[4]["n_words"] == 3
