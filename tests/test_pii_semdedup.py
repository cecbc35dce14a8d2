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
