"""Semantic invariants for the round-4 late additions: PII scrub
(textops.pii_scrub_stats) and SemDeDup-style semantic pruning
(similarity.semdedup_prune). Cross-engine value parity is covered by
test_oracle_parity's sweep; these pin the operator *semantics* and the
plan shapes the 100 TB story depends on."""

from __future__ import annotations

import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from medallion_etl_spark.operators.similarity import (
    SEM_TAU,
    _min_cell,
    _normed,
    _refined_centroids,
    semdedup_prune,
)
from medallion_etl_spark.operators.textops import (
    PII_EMAIL_RE,
    PII_IP_RE,
    PII_PHONE_RE,
    _PII_AUG_SQL,
    pii_scrub_stats,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


# --------------------------------------------------------------------------
# PII scrub


def test_pii_injection_is_detected_per_modulus(spark, sf_tiny):
    out = pii_scrub_stats(spark, sf_tiny).toPandas().set_index("doc_id")
    for doc_id, row in out.iterrows():
        assert row["n_emails"] >= (1 if doc_id % 3 == 0 else 0)
        assert row["n_phones"] >= (1 if doc_id % 5 == 0 else 0)
        assert row["n_ips"] >= (1 if doc_id % 7 == 0 else 0)
        assert row["n_redactions"] == row["n_emails"] + row["n_phones"] + row["n_ips"]
    # the synthetic corpus has no natural PII, so the counts are exact
    assert int(out["n_emails"].sum()) == sum(1 for d in out.index if d % 3 == 0)


def test_pii_redaction_leaves_no_matches(spark, sf_tiny):
    """Redacted text must contain zero residual PII matches — recount
    the patterns over the redacted output itself."""
    from medallion_etl_spark.sources.readers import load_table

    docs = load_table(spark, sf_tiny, "documents")
    aug = F.expr(_PII_AUG_SQL)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"), PII_PHONE_RE, "<PHONE>"
        ),
        PII_IP_RE,
        "<IP>",
    )
    residue = docs.select(
        (
            F.regexp_count(redacted, F.lit(PII_EMAIL_RE))
            + F.regexp_count(redacted, F.lit(PII_PHONE_RE))
            + F.regexp_count(redacted, F.lit(PII_IP_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("total"))
    assert residue.collect()[0]["total"] == 0


def test_pii_scrub_plan_has_no_join(spark, sf_tiny):
    """Per-row scrub is scan-speed work: no join node may appear."""
    p = _plan(pii_scrub_stats(spark, sf_tiny))
    assert "Join" not in p


# --------------------------------------------------------------------------
# SemDeDup


def test_semdedup_matches_bruteforce_rule(spark, sf_tiny):
    """pruned(vec) <=> exists a lower-vec_id cell-mate with
    round(cosine, 6) >= SEM_TAU — recomputed brute-force in numpy."""
    n = _normed(spark, sf_tiny)
    cents = _refined_centroids(n)
    rows = (
        n.withColumn("cell", _min_cell(F.col("v"), cents).getField("cell"))
        .select("vec_id", "cell", "v")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    cells = np.array([r["cell"] for r in rows])
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    order = np.argsort(ids)
    ids, cells, mat, norms = ids[order], cells[order], mat[order], norms[order]

    expect = {}
    for i in range(len(ids)):
        mates = (cells == cells[i]) & (ids < ids[i])
        if mates.any():
            cos = (mat[mates] @ mat[i]) / (norms[mates] * norms[i])
            expect[int(ids[i])] = bool((np.round(cos, 6) >= SEM_TAU).any())
        else:
            expect[int(ids[i])] = False

    got = {
        int(r["vec_id"]): bool(r["is_pruned"])
        for r in semdedup_prune(spark, sf_tiny).collect()
    }
    assert got == expect
    assert any(got.values()), "calibration drift: nothing pruned"
    assert not all(got.values()), "calibration drift: everything pruned"


def test_semdedup_keeps_the_lowest_id_of_every_cell(spark, sf_tiny):
    out = semdedup_prune(spark, sf_tiny).toPandas()
    first = out.sort_values("vec_id").groupby("cell").first()
    assert not first["is_pruned"].any()


def test_semdedup_pair_join_is_cell_bounded(spark, sf_tiny):
    """The quadratic must be bounded by the cell equi-join: never a
    cartesian or broadcast-nested-loop pair generation."""
    p = _plan(semdedup_prune(spark, sf_tiny))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# --------------------------------------------------------------------------
# Composition: the curation funnel's semantic stage


def test_semantic_stage_insertion_is_otherwise_a_noop(spark, sf_tiny):
    """With an EMPTY drop set the composition must equal the plain
    funnel exactly — the stage's join plumbing perturbs nothing. (The
    stage is NOT equivalent to pre-filtering the corpus: removing docs
    up-front would change dedup canon selection and the benchmark
    shingle set; the oracle parity sweep pins the real mid-funnel
    values.)"""
    from medallion_etl_spark.operators.curation import (
        _curate,
        curated_training_mix,
    )
    from medallion_etl_spark.operators.util import spread
    from medallion_etl_spark.sources.readers import load_table

    docs = spread(spark, load_table(spark, sf_tiny, "documents"))
    empty = spark.range(0).select(F.col("id").alias("vec_id"))
    rollup = lambda df: {  # noqa: E731
        r["source"]: (r["n_docs"], r["total_chars"], r["sum_quality"])
        for r in df.collect()
    }
    assert rollup(_curate(docs, sem_pruned=empty)) == rollup(
        curated_training_mix(spark, sf_tiny)
    )


def test_semantic_stage_only_removes_docs(spark, sf_tiny):
    """Per-source counts of the semantic composition are bounded above
    by the plain funnel's, and at least one pruned doc was a funnel
    survivor (the stage is exercised, not vacuous)."""
    from medallion_etl_spark.operators.curation import (
        curated_training_mix,
        semantic_curated_mix,
    )

    plain = {r["source"]: r["n_docs"] for r in curated_training_mix(spark, sf_tiny).collect()}
    sem = {r["source"]: r["n_docs"] for r in semantic_curated_mix(spark, sf_tiny).collect()}
    assert set(sem) <= set(plain)
    assert all(sem[s] <= plain[s] for s in sem)
    assert sum(sem.values()) < sum(plain.values())


def test_semantic_stage_is_a_broadcast_anti_join(spark, sf_tiny):
    """The drop set must broadcast: the surviving documents never
    reshuffle for the semantic stage."""
    from medallion_etl_spark.operators.curation import semantic_curated_mix

    p = _plan(semantic_curated_mix(spark, sf_tiny))
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
