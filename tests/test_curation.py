"""Curation funnel: every stage discards something (non-degenerate),
the composition is consistent with its standalone components, and the
document text never enters a shuffle."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from medallion_etl_spark.operators.curation import (
    CONTAM_DEN,
    CONTAM_NUM,
    QUALITY_MIN,
    _quality,
    curated_training_mix,
)
from medallion_etl_spark.operators.dedup_text import _shingles, _words
from medallion_etl_spark.sources.readers import load_table as T

SF = "/root/testdata/sf0.001"


def test_every_stage_discards_but_output_is_not_degenerate(spark):
    docs = T(spark, SF, "documents")
    n_all = docs.count()
    qual = docs.withColumn("q", _quality()).filter(F.col("q") >= QUALITY_MIN)
    n_qual = qual.count()
    assert 0 < n_qual < n_all

    out = curated_training_mix(spark, SF).toPandas()
    n_final = int(out["n_docs"].sum())
    # the funnel kept a meaningful corpus but strictly fewer than the
    # quality gate alone (dedup/decontam/mix each bite)
    assert 0 < n_final < n_qual
    # multiple sources survive — the mix didn't collapse to one bucket
    assert len(out) >= 5


def test_contamination_stage_drops_high_containment_docs(spark):
    docs = T(spark, SF, "documents")
    flat = docs.select("doc_id", F.explode(_shingles(_words())).alias("shingle"))
    is_bench = F.col("doc_id") % 20 == 0
    bench = flat.filter(is_bench).select("shingle").distinct()
    sizes = flat.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        flat.filter(~is_bench)
        .join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    contaminated = hits.join(sizes, "doc_id").filter(
        F.col("n_hits") * CONTAM_DEN >= F.col("n_sh") * CONTAM_NUM
    )
    n_cont = contaminated.count()
    assert n_cont > 0  # the synthetic corpus plants true bench near-copies
    # no contaminated doc survives the funnel output's id space
    bad = {r["doc_id"] for r in contaminated.select("doc_id").collect()}
    # (output is a per-source rollup; re-derive the kept id set by
    # running the funnel's own stages is circular — instead assert the
    # rollup total is consistent: kept docs <= non-bench, non-contaminated)
    n_docs = T(spark, SF, "documents").count()
    n_bench = T(spark, SF, "documents").filter(F.col("doc_id") % 20 == 0).count()
    out_total = int(curated_training_mix(spark, SF).toPandas()["n_docs"].sum())
    assert out_total <= n_docs - n_bench - len(bad)


def test_text_never_shuffles(spark):
    """The funnel's contract at 100 TB: exchanges carry ids, digests and
    shingle hashes — never the document text column."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        curated_training_mix(spark, SF).explain(mode="formatted")
    plan = buf.getvalue()
    blocks = re.split(r"\n\(\d+\) ", plan)
    exchange_blocks = [b for b in blocks if b.startswith("Exchange")]
    assert exchange_blocks, plan
    for b in exchange_blocks:
        if "RoundRobinPartitioning" in b:
            # the spread() input-split spreader (sandbox-only: the tiny
            # documents parquet is one split; a 100-TB table has
            # thousands and never takes this repartition)
            continue
        assert not re.search(r"\btext#", b), b
