"""Driver-contract window invariants (operators/__init__.py).

The round driver gates only the FIRST 50 ``queries()`` entries in
insertion order, so the ordering IS part of the contract: round 3's
record showed 18 implemented operators with no driver row purely
because they sat past the window. These checks keep the window pinned:
exactly 50 names, all resolvable, every entry oracle-paired, and the
set of never-driver-checked round-3 operators inside it.

No SparkSession needed — pure registry checks.
"""

from __future__ import annotations

from medallion_etl_spark.operators import DRIVER_WINDOW, collect_queries

NEVER_CHECKED_BEFORE_R4 = {
    "near_dup_clusters",
    "cdc_incremental_signatures",
    "curated_training_mix",
    "ann_ivf_topk",
    "kmv_distinct_users",
    "hll_distinct_users",
    "cms_word_counts",
    "asof_attribution",
    "view_purchase_range_join",
    "user_sessions",
    "scd2_user_type",
    "packed_sequences",
}

# Round-5 rotation targets (VERDICT r4 tasks 1 + 3): the queries whose
# ONLY green driver row is two-plus rounds old (r2/r3 singles) must be
# back in the window, and the new bounded-state percentile gates must
# be driver-checked in their first round.
R5_MUST_CHECK = {
    # r2-single-green (CORRECTNESS_r02 only)
    "simhash_clusters",
    "embedding_near_dup_pairs",
    "ann_topk_bruteforce",
    "ann_lsh_topk",
    "embedding_centroid_distance",
    # r3-single-green (CORRECTNESS_r03 only)
    "cobertura_sucursal_aguas",
    "cobertura_sucursal_generico",
    "decontaminate_against_benchmark",
    "doc_length_percentiles",
    # new in r5
    "doc_length_percentiles_approx",
    "lm_cutoffs_approx",
}


def test_window_is_exactly_the_first_50_entries():
    q = collect_queries()
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50, "duplicate names in DRIVER_WINDOW"
    assert list(q)[:50] == list(DRIVER_WINDOW)


def test_never_checked_operators_are_inside_the_window():
    # kept through r5: each needs a second green row on top of its r4 one
    assert NEVER_CHECKED_BEFORE_R4 <= set(DRIVER_WINDOW)


def test_r5_rotation_targets_are_inside_the_window():
    assert R5_MUST_CHECK <= set(DRIVER_WINDOW)


def test_every_query_is_oracle_paired():
    # r3 finding: hll_distinct_users was the one queries() entry with
    # no oracle_sql() pair — a structural error if the window reaches
    # it. Now every entry must be paired (rows+schema+values gated).
    q = collect_queries()
    unpaired = [n for n, (_fn, sql) in q.items() if sql is None]
    assert unpaired == [], f"queries() entries without oracle SQL: {unpaired}"


def test_driver_contract_module_roundtrip():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert list(q)[:50] == list(DRIVER_WINDOW)
    assert set(o) == set(q)
