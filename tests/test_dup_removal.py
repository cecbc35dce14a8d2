"""Exact-substring duplicate-span removal (operators/dedup_text.py).

Semantics under test (Lee et al. 2022 ExactSubstr, re-expressed on the
fixed-K window grid): every occurrence of a duplicated K-word window
past the global first (ordered by doc_id, pos) is removed, removal
covers the K positions under the window, and the document is rewritten
from the surviving words. Brute-force Python oracle over crafted and
randomized corpora, plus the plan shape that makes it scale: NO join
node (row_number over the digest, union + carry-forward window).
"""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from medallion_etl_spark.operators.dedup_text import dup_span_removal

pytestmark = pytest.mark.usefixtures("spark")


def brute(docs: list[tuple[int, str]], k: int) -> dict[int, tuple[int, int, str]]:
    words = {d: t.lower().split(" ") for d, t in docs}
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, _ in docs:
        ws = words[d]
        for i in range(len(ws) - k + 1):
            occ.setdefault(" ".join(ws[i : i + k]), []).append((d, i + 1))
    removal: dict[int, list[int]] = {}
    for lst in occ.values():
        lst.sort()
        for d, p in lst[1:]:
            removal.setdefault(d, []).append(p)
    out = {}
    for d, _ in docs:
        ws = words[d]
        cov = [False] * len(ws)
        for s in removal.get(d, []):
            for j in range(s, min(s + k, len(ws) + 1)):
                cov[j - 1] = True
        kept = " ".join(w for w, c in zip(ws, cov) if not c)
        out[d] = (len(ws), sum(cov), hashlib.md5(kept.encode()).hexdigest())
    return out


def run(spark, docs: list[tuple[int, str]], k: int) -> dict[int, tuple[int, int, str]]:
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = dup_span_removal(df, k).collect()
    assert len(rows) == len(docs)
    return {r.doc_id: (r.n_words, r.n_removed, r.kept_md5) for r in rows}


def check(spark, docs, k=3):
    assert run(spark, docs, k) == brute(docs, k)


def test_cross_doc_duplicate_removed_keeper_kept(spark):
    docs = [
        (1, "a b c d e"),  # first occurrence of "a b c" -> kept intact
        (2, "x a b c y"),  # second occurrence -> "a b c" cut, "x y" survive
    ]
    res = run(spark, docs, 3)
    assert res == brute(docs, 3)
    assert res[1][1] == 0
    assert res[2] == (5, 3, hashlib.md5(b"x y").hexdigest())


def test_within_doc_repeat_removed(spark):
    # the second "a b c" inside the SAME doc is past the global first
    check(spark, [(1, "a b c z a b c")])


def test_short_docs_pass_through(spark):
    docs = [(1, "a b"), (2, "a b"), (3, "q")]
    res = run(spark, docs, 3)
    assert res == brute(docs, 3)
    assert all(v[1] == 0 for v in res.values())


def test_full_removal_yields_empty_md5(spark):
    docs = [(1, "a b c"), (2, "a b c")]
    res = run(spark, docs, 3)
    assert res[2] == (3, 3, hashlib.md5(b"").hexdigest())


def test_overlapping_windows_union_coverage(spark):
    # doc 2 repeats a 4-word span: two overlapping dup 3-windows whose
    # coverage must union to 4 removed words, not 6
    docs = [(1, "a b c d"), (2, "z a b c d z")]
    res = run(spark, docs, 3)
    assert res == brute(docs, 3)
    assert res[2][1] == 4


def test_keeper_is_min_doc_then_pos(spark):
    # same window twice in doc 1 (pos 1 and pos 5) and once in doc 0:
    # doc 0 owns the global first by doc_id order
    docs = [(0, "a b c"), (1, "a b c z a b c")]
    res = run(spark, docs, 3)
    assert res == brute(docs, 3)
    assert res[0][1] == 0 and res[1][1] == 6


def test_randomized_against_brute_force(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 30))))
        for d in range(40)
    ]
    check(spark, docs, 3)
    check(spark, docs, 5)


def test_plan_is_join_free_and_digest_exchange_never_carries_text(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = dup_span_removal(df, 3)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    # the only wide payload is single words for the rebuild; whole-doc
    # text must be projected away before any exchange
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text" not in line, line
