"""Invariant pins for token-budget corpus selection
(operators/selection.py). The sf0.01 value-exact oracle parity is
covered by test_oracle_parity; these check the selection SEMANTICS on
real testdata — properties that must hold for any corpus:

- the selected token total never exceeds the budget;
- selection is monotone in quality: every document in a quality bucket
  above the boundary is selected, every one below is not;
- within the boundary bucket, the selected docs are exactly the
  maximal doc_id-ordered prefix that fits the remaining budget.
"""

from __future__ import annotations

import math

from medallion_etl_spark.operators.selection import (
    BUDGET_FRAC,
    QUANTUM,
    token_budget_selection,
)


def test_budget_and_monotonicity(spark, sf_tiny):
    rows = token_budget_selection(spark, sf_tiny).collect()
    assert rows, "empty selection output"
    budget = math.floor(sum(r["n_tok"] for r in rows) * BUDGET_FRAC)
    picked = [r for r in rows if r["selected"]]
    assert picked, "budget of half the corpus must select something"
    assert sum(r["n_tok"] for r in picked) <= budget

    qb = lambda r: math.floor(r["quality_score"] * QUANTUM)
    sel_buckets = {qb(r) for r in picked}
    unsel_buckets = {qb(r) for r in rows if not r["selected"]}
    # at most ONE bucket is split between selected and unselected
    split = sel_buckets & unsel_buckets
    assert len(split) <= 1
    # strict ordering: every selected-only bucket sits above every
    # unselected-only bucket, with the split bucket (if any) between
    if split:
        b = next(iter(split))
        assert all(x >= b for x in sel_buckets)
        assert all(x <= b for x in unsel_buckets)
    elif sel_buckets and unsel_buckets:
        assert min(sel_buckets) > max(unsel_buckets)


def test_boundary_prefix_is_maximal(spark, sf_tiny):
    rows = token_budget_selection(spark, sf_tiny).collect()
    budget = math.floor(sum(r["n_tok"] for r in rows) * BUDGET_FRAC)
    qb = lambda r: math.floor(r["quality_score"] * QUANTUM)
    split = {qb(r) for r in rows if r["selected"]} & {
        qb(r) for r in rows if not r["selected"]
    }
    if not split:
        return  # corpus happened to cut exactly on a bucket edge
    b = next(iter(split))
    bucket_rows = sorted((r for r in rows if qb(r) == b), key=lambda r: r["doc_id"])
    # tokens spent on buckets strictly above the boundary
    spent = sum(r["n_tok"] for r in rows if r["selected"] and qb(r) > b)
    remaining = budget - spent
    cum = 0
    for r in bucket_rows:
        cum += r["n_tok"]
        assert r["selected"] == (cum <= remaining), (
            f"doc {r['doc_id']}: prefix rule violated at cum={cum}, "
            f"remaining={remaining}"
        )
