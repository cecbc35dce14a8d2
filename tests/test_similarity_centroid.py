"""Centroid-distance operator: the scalable (no group
materialization) path must agree with the grouped-pandas baseline and
with a trivially-correct numpy oracle, including under a pathologically
hot label (the 100 TB OOM scenario the grouped variant cannot survive).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from medallion_etl_spark.operators.similarity import (
    embedding_centroid_distance,
    embedding_centroid_distance_grouped,
)

DIM = 64


def _write_embeddings(spark, path, labels):
    """Deterministic embeddings: value = f(vec_id, dim)."""
    rows = []
    for vec_id, label in enumerate(labels):
        emb = [((vec_id * 31 + d * 7) % 97) / 97.0 for d in range(DIM)]
        rows.append((vec_id, label, [float(x) for x in emb]))
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    df.write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return rows


def _numpy_oracle(rows):
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    out = []
    for label, grp in pdf.groupby("label"):
        mat = np.stack(grp["embedding"].to_numpy()).astype("float64")
        cent = mat.mean(axis=0)
        dist = np.sqrt(((mat - cent) ** 2).sum(axis=1)).astype("float32")
        out.append(pd.DataFrame({"label": label, "vec_id": grp["vec_id"], "dist": dist}))
    return pd.concat(out).sort_values("vec_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def hot_label_dir(spark, tmp_path_factory):
    """One label holds 90% of all vectors — the skew shape that OOMs a
    whole-group materialization at scale."""
    path = str(tmp_path_factory.mktemp("cent"))
    labels = [0] * 450 + list(range(1, 51))  # label 0 holds 90% of vectors
    rows = _write_embeddings(spark, path, labels)
    return path, rows


def test_scalable_path_matches_numpy_oracle(spark, hot_label_dir):
    path, rows = hot_label_dir
    got = (
        embedding_centroid_distance(spark, path)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    oracle = _numpy_oracle(rows)
    assert got["label"].tolist() == oracle["label"].tolist()
    # float32 quantization absorbs float64 summation-order ulps
    np.testing.assert_allclose(
        got["dist_to_centroid"].to_numpy(), oracle["dist"].to_numpy(), rtol=2e-6
    )


def test_scalable_path_equals_grouped_baseline(spark, hot_label_dir):
    path, _rows = hot_label_dir
    a = (
        embedding_centroid_distance(spark, path)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        embedding_centroid_distance_grouped(spark, path)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    np.testing.assert_allclose(
        a["dist_to_centroid"].to_numpy(), b["dist_to_centroid"].to_numpy(), rtol=2e-6
    )


def test_hot_label_cannot_oom(spark, hot_label_dir):
    """The scalable plan must contain NO grouped-pandas stage: the hot
    label flows through a hash aggregate (one cell) + broadcast join,
    never a single-worker group materialization."""
    path, _rows = hot_label_dir
    plan = (
        embedding_centroid_distance(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FlatMapGroupsInPandas" not in plan
    assert "HashAggregate" in plan
    assert "Broadcast" in plan
