"""Distinct-count sketches: KMV accuracy + merge consistency on
high-cardinality synthetic input, and the HLL production path's
accuracy vs exact counts (its only check — no cross-engine oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_etl_spark.operators.sketch import K, kmv_by_group


def _synth(spark, n_rows: int, n_groups: int = 4):
    # distinct cardinality differs per group: group g holds ids with
    # id % 4 == g, each appearing twice (dup rows exercise DISTINCT)
    return (
        spark.range(n_rows)
        .select(
            F.concat(F.lit("g"), (F.col("id") % n_groups)).alias("grp"),
            (F.col("id") % (n_rows // 2)).alias("uid"),
        )
    )


def test_kmv_estimate_within_theory_bound(spark):
    df = _synth(spark, 20_000)  # 2500 distinct uids per group, 10k global
    rows = {r["source"]: r for r in kmv_by_group(df, "grp", "uid").collect()}
    # KMV standard error ~ 1/sqrt(K-2); allow 3 sigma
    tol = 3.0 / (K - 2) ** 0.5
    for src, r in rows.items():
        assert r["n_kept"] == K
        err = abs(r["kmv_estimate"] - r["exact_distinct"]) / r["exact_distinct"]
        assert err < tol, (src, r["kmv_estimate"], r["exact_distinct"])


def test_kmv_merged_row_equals_sketch_of_union(spark):
    """__ALL__ must equal the sketch built directly over the ungrouped
    input — merging per-group min-K sets IS the global min-K set."""
    df = _synth(spark, 20_000)
    merged = {
        r["source"]: r["kmv_estimate"] for r in kmv_by_group(df, "grp", "uid").collect()
    }["__ALL__"]
    direct = {
        r["source"]: r["kmv_estimate"]
        for r in kmv_by_group(df.withColumn("one", F.lit("x")), "one", "uid").collect()
    }["x"]
    assert merged == direct


def test_kmv_exact_below_k(spark):
    df = _synth(spark, 4 * (K // 2))  # K/4... few distinct uids per group
    for r in kmv_by_group(df, "grp", "uid").collect():
        if r["n_kept"] < K:
            assert r["kmv_estimate"] == float(r["exact_distinct"])


def test_hll_accuracy_vs_exact(spark):
    df = _synth(spark, 40_000)  # 5000 distinct per group, 20k global
    per = df.groupBy("grp").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est"),
        F.countDistinct("uid").alias("exact"),
    )
    glob = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("uid")).alias("est"),
        F.countDistinct("uid").alias("exact"),
    )
    for r in per.collect() + glob.collect():
        assert abs(r["est"] - r["exact"]) / r["exact"] < 0.05, dict(r.asDict())


def test_cms_one_sided_and_mergeable(spark, sf_tiny):
    """Count-Min guarantees: est >= true for EVERY key, and grids
    built from disjoint splits merge by per-cell summation into
    exactly the whole-corpus grid."""
    from pyspark.sql import functions as F

    from medallion_etl_spark.operators.sketch import cms_grid, cms_word_counts

    out = cms_word_counts(spark, sf_tiny).collect()
    assert len(out) > 0
    assert all(r["overcount"] >= 0 for r in out)

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    words = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.length("word") > 0)
    half_a = cms_grid(words.filter(F.col("doc_id") % 2 == 0))
    half_b = cms_grid(words.filter(F.col("doc_id") % 2 == 1))
    merged = (
        half_a.unionByName(half_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_grid(words)
    canon = lambda df: sorted(tuple(r) for r in df.collect())
    assert canon(merged) == canon(whole)
