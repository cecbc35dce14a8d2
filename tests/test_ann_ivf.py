"""IVF ANN: map-only assignment plan, deterministic training, and a
recall floor vs the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_etl_spark.operators.similarity import (
    N_CELLS,
    N_PROBE,
    _min_cell,
    _normed,
    _refined_centroids,
    ann_ivf_topk,
    ann_topk_bruteforce,
)

SF = "/root/testdata/sf0.001"


def test_training_is_deterministic(spark):
    n = _normed(spark, SF)
    a = _refined_centroids(n)
    b = _refined_centroids(n)
    assert a == b
    assert 1 <= len(a) <= N_CELLS
    # cells are ids into the seed set, every centroid is full-dim
    assert all(0 <= cell < N_CELLS and len(c) == 64 for cell, c in a)


def test_assignment_is_map_only(spark):
    """The IVF point: nearest-cell assignment must be a pure projection
    (centroids are literals folded per row), never an N x C join or a
    shuffle — that is what lets it run at scan speed on 100 TB."""
    n = _normed(spark, SF)
    cents = _refined_centroids(n)
    assigned = n.withColumn("cell", _min_cell(F.col("v"), cents).getField("cell"))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_every_vector_lands_in_exactly_one_cell(spark):
    n = _normed(spark, SF)
    cents = _refined_centroids(n)
    assigned = n.withColumn("cell", _min_cell(F.col("v"), cents).getField("cell"))
    total = assigned.count()
    assert total == n.count()
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    cells = {r["cell"] for r in assigned.select("cell").distinct().collect()}
    assert cells <= {cell for cell, _ in cents}


def test_recall_floor_vs_bruteforce(spark):
    """Probing N_PROBE of N_CELLS cells scans ~N_PROBE/N_CELLS of the
    data; recall must beat that random-scan floor by a wide margin
    (measured 0.46 at sf0.001 / 0.40 at sf0.1 on the near-uniform
    synthetic embeddings; real clustered corpora do far better)."""
    ivf = ann_ivf_topk(spark, SF).toPandas()
    bf = ann_topk_bruteforce(spark, SF).toPandas()
    bfs = set(map(tuple, bf[["query_id", "vec_id"]].values.tolist()))
    ivs = set(map(tuple, ivf[["query_id", "vec_id"]].values.tolist()))
    recall = len(bfs & ivs) / len(bfs)
    assert recall >= 1.5 * (N_PROBE / N_CELLS), recall
    # and the ranking inside the probed set is exact: every returned
    # pair that IS a true top-k neighbor carries the same cosine
    merged = ivf.merge(bf, on=["query_id", "vec_id"], suffixes=("_i", "_b"))
    assert (merged["cosine_i"] == merged["cosine_b"]).all()
