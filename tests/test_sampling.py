"""Semantic pins for the sampling operators (operators/sampling.py).
sf0.01 value-exact oracle parity is covered by test_oracle_parity."""

from __future__ import annotations

from collections import Counter

from medallion_etl_spark.operators.sampling import (
    SAMPLE_K,
    stratified_sample_k,
    temperature_mix_weights,
)


def test_stratified_exactly_k_per_source_and_deterministic(spark, sf_tiny):
    rows = stratified_sample_k(spark, sf_tiny).collect()
    per_src = Counter(r["source"] for r in rows)
    # every stratum present in the corpus yields min(K, |stratum|) rows
    # with dense ranks 1..n
    assert per_src, "no strata sampled"
    for src, n in per_src.items():
        assert 1 <= n <= SAMPLE_K
        ranks = sorted(r["sample_rank"] for r in rows if r["source"] == src)
        assert ranks == list(range(1, n + 1)), f"{src}: non-dense ranks {ranks}"
    # deterministic: a second invocation returns the identical sample
    again = stratified_sample_k(spark, sf_tiny).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_temperature_flattens_the_mix(spark, sf_tiny):
    rows = temperature_mix_weights(spark, sf_tiny).collect()
    assert len(rows) >= 2
    total_w = sum(r["mix_weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-4  # rounded weights still sum to ~1
    toks = {r["source"]: r["n_toks"] for r in rows}
    w = {r["source"]: r["mix_weight"] for r in rows}
    big = max(toks, key=toks.get)
    small = min(toks, key=toks.get)
    if toks[big] > toks[small]:
        # sqrt temperature compresses the spread: the weight ratio
        # between the largest and smallest source is strictly smaller
        # than their raw token-share ratio
        assert w[big] / w[small] < toks[big] / toks[small]
        # ...but ordering is preserved (monotone in size)
        assert w[big] >= w[small]
    all_toks = sum(toks.values())
    for r in rows:
        assert r["expected_toks"] <= r["mix_weight"] * all_toks


def test_split_assignment_is_stable_under_corpus_growth(spark, sf_tiny):
    """A doc's split depends only on its key: recomputing over any
    subset/superset of the corpus must never move a doc across splits
    (the property that prevents eval leakage across releases)."""
    from medallion_etl_spark.operators.sampling import train_val_test_split
    from medallion_etl_spark.sources.readers import load_table

    full = train_val_test_split(spark, sf_tiny).toPandas().set_index("doc_id")
    docs = load_table(spark, sf_tiny, "documents")
    from medallion_etl_spark.operators.sampling import split_assign

    half = (
        split_assign(docs.filter("doc_id % 2 = 0"), "doc_id")
        .select("doc_id", "split")
        .toPandas()
        .set_index("doc_id")
    )
    joined = half.join(full, rsuffix="_full")
    assert (joined["split"] == joined["split_full"]).all()
    # all three splits materialize and train dominates
    counts = full["split"].value_counts()
    assert set(counts.index) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]
