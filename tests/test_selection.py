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


# --------------------------------------------------------------------------
# deterministic shuffle + shard cutting


def _brute_shards(docs, shard_tokens):
    """Python oracle: global (h, doc_id) order, running prefix, cut."""
    import hashlib

    rows = []
    for doc_id, text in docs:
        n_tok = len(text.lower().split(" "))
        h = hashlib.md5(f"shuffle|{doc_id}".encode()).hexdigest()
        rows.append((h, doc_id, n_tok))
    rows.sort()
    out, before = {}, 0
    for h, doc_id, n_tok in rows:
        out[doc_id] = (before // shard_tokens, before)
        before += n_tok
    return out


def test_shard_assignment_matches_global_sort_oracle(spark):
    import random

    from medallion_etl_spark.operators.selection import shuffle_shard_assign

    rng = random.Random(7)
    docs = [
        (i, " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randint(1, 300))))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.global_before)
        for r in shuffle_shard_assign(df, 500, slot="t_shard").collect()
    }
    assert got == _brute_shards(docs, 500)


def test_shard_assignment_is_invariant_in_prefix_width(spark):
    """VERDICT r4 task 5: the hash-prefix width (16**k buckets) is a
    pure parallelism knob — 16 buckets (k=1) and 4096 buckets (k=3)
    must both reproduce the naive global-window oracle exactly, so
    re-tuning the width for a bigger corpus never changes which shard
    any document lands in."""
    import random

    from medallion_etl_spark.operators.selection import shuffle_shard_assign

    rng = random.Random(11)
    docs = [
        (i, " ".join(f"w{rng.randrange(40)}" for _ in range(rng.randint(1, 300))))
        for i in range(400)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = _brute_shards(docs, 500)
    for k in (1, 3):
        got = {
            r.doc_id: (r.shard, r.global_before)
            for r in shuffle_shard_assign(
                df, 500, slot=f"t_shard_w{k}", prefix_chars=k
            ).collect()
        }
        assert got == want, f"prefix_chars={k} diverged from the global oracle"


def test_shards_conserve_tokens_and_are_deterministic(spark, sf_tiny):
    from pyspark.sql import functions as F

    from medallion_etl_spark.operators.selection import shuffled_shards
    from medallion_etl_spark.sources.readers import load_table as T

    a = shuffled_shards(spark, sf_tiny).toPandas()
    b = shuffled_shards(spark, sf_tiny).toPandas()
    assert a.equals(b)
    total = (
        T(spark, sf_tiny, "documents")
        .select(F.size(F.split(F.lower("text"), " ")).alias("n"))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert int(a.n_tokens.sum()) == total
    assert a.n_docs.sum() == T(spark, sf_tiny, "documents").count()


def test_shards_plan_has_no_global_row_sort(spark, sf_tiny):
    from medallion_etl_spark.operators.selection import shuffled_shards

    plan = (
        shuffled_shards(spark, sf_tiny)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the only range partitioning is the final orderBy of the tiny
    # per-shard rollup — the doc-bearing frame is never globally sorted
    assert plan.count("rangepartitioning") == 1, plan
