"""Approximate-nearest-neighbor search over the ``embeddings`` table
(``embedding: array<float>``, 64-dim).

Two variants, same query surface:

- ``ann_topk_bruteforce``: exact top-k cosine per query via a pair
  join + window rank. The correctness baseline; O(Q x N) — fine when
  Q is small or N fits a broadcast, not the 100 TB path.
- ``ann_lsh_topk``: random-hyperplane LSH. Vectors are bucketed by the
  sign pattern of dot products with ``N_PLANES`` fixed hyperplanes;
  each query only scores candidates in its own bucket. At scale this
  is a bucket-key equi-join (shuffle on a short string key) instead of
  a cross join — candidates per query drop from N to N / 2^planes on
  average. Multi-probe (flipping one bit) cuts the recall loss of hard
  bucket boundaries.

The hyperplanes are derived in Python from md5 (deterministic, no RNG
state) and embedded as literals in BOTH the Spark plan and the oracle
SQL, so the two engines score identical candidates. All dot products
are double-precision left-to-right folds; similarities rounded to 6
decimals.

Everything is JVM-side expression work (``zip_with``/``aggregate``);
no Python UDF in the row path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

DIM = 64
TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
N_PLANES = 6


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random +-1 hyperplanes from md5 — no RNG
    state, identical in any process."""
    planes = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane{p}|{d}".encode()).hexdigest()
            row.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        planes.append(row)
    return planes


PLANES = _hyperplanes()


def _dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _dvec(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def _plane_dot(v: F.Column, plane: list[float]) -> F.Column:
    return _dot(v, F.array(*[F.lit(x) for x in plane]))


def _bucket_bits(v: F.Column) -> F.Column:
    """Sign pattern over the hyperplanes as a '010110'-style string."""
    return F.concat(
        *[F.when(_plane_dot(v, pl) >= 0, F.lit("1")).otherwise(F.lit("0")) for pl in PLANES]
    )


def _normed(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings").select("vec_id", _dvec("embedding").alias("v"))
    return emb.select("vec_id", "v", F.sqrt(_dot(F.col("v"), F.col("v"))).alias("norm"))


# --------------------------------------------------------------------------


def ann_topk_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    n = _normed(spark, sf)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(q)
        .join(n, F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


_DOT_SQL = "list_reduce(list_transform(range(1, {d}), i -> {a}[i] * {b}[i]), (x, y) -> x + y)"


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(d=DIM + 1, a=a, b=b)


ANN_TOPK_BRUTEFORCE_SQL = f"""
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), nn AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS norm FROM n
), scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round({_dot_sql('q.v', 'c.v')} / (q.norm * c.norm), 6) AS cosine
  FROM nn q JOIN nn c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < {N_QUERIES}
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank,
       vec_id, cosine
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""

# --------------------------------------------------------------------------


def ann_lsh_topk(spark: SparkSession, sf: str) -> DataFrame:
    n = _normed(spark, sf).withColumn("bucket", _bucket_bits(F.col("v")))
    # multi-probe: each query probes its own bucket plus every
    # 1-bit-flipped neighbor bucket
    probes = F.array(
        F.col("bucket"),
        *[
            F.concat(
                F.substring("bucket", 1, i),
                F.when(F.substring("bucket", i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring("bucket", i + 2, N_PLANES - i - 1),
            )
            for i in range(N_PLANES)
        ],
    )
    q = (
        n.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("norm").alias("qn"),
            F.explode(probes).alias("bucket"),
        )
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(q)
        .join(n, ["bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _plane_sql(var: str, plane: list[float]) -> str:
    lits = "[" + ", ".join(f"{x:.1f}" for x in plane) + "]"
    return (
        f"list_reduce(list_transform(range(1, {DIM + 1}), i -> {var}[i] * ({lits})[i]),"
        " (x, y) -> x + y)"
    )


_BUCKET_SQL = " || ".join(
    f"CASE WHEN {_plane_sql('v', pl)} >= 0 THEN '1' ELSE '0' END" for pl in PLANES
)

_PROBE_LIST_SQL = "[bucket, " + ", ".join(
    f"bucket[1:{i}] || (CASE WHEN bucket[{i + 1}:{i + 1}] = '1' THEN '0' ELSE '1' END)"
    + (f" || bucket[{i + 2}:{N_PLANES}]" if i + 2 <= N_PLANES else "")
    for i in range(N_PLANES)
) + "]"

ANN_LSH_TOPK_SQL = f"""
WITH n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), nn AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS norm,
         {_BUCKET_SQL} AS bucket
  FROM n
), q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qn,
         unnest({_PROBE_LIST_SQL}) AS bucket
  FROM nn WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT DISTINCT q.query_id, c.vec_id,
         round({_dot_sql('q.qv', 'c.v')} / (q.qn * c.norm), 6) AS cosine
  FROM q JOIN nn c USING (bucket)
  WHERE c.vec_id <> q.query_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank,
       vec_id, cosine
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# Grouped Arrow-batched operator: per-label centroid + per-vector
# distance via applyInPandas — the IVF building block (centroids =
# coarse quantizer cells; at scale the same shape trains/assigns cells
# per partition). numpy does the per-group math on Arrow-delivered
# batches; no per-row Python.

CENTROID_DIST_SCHEMA = "label int, vec_id long, dist_to_centroid float"


def _label_centroid_dist(pdf):
    import numpy as np
    import pandas as pd

    mat = np.stack(pdf["embedding"].to_numpy()).astype("float64")
    centroid = mat.mean(axis=0)
    # float32 output: numpy's pairwise summation and the oracle's
    # sequential SUM differ by ~1 ulp of float64; quantizing to float32
    # (whose ulp is ~1e7 x larger) makes both engines emit identical
    # bits, unlike round(, 6) which keeps a knife-edge at .5e-6
    dist = np.sqrt(((mat - centroid) ** 2).sum(axis=1)).astype("float32")
    return pd.DataFrame(
        {
            "label": pdf["label"],
            "vec_id": pdf["vec_id"],
            "dist_to_centroid": dist,
        }
    )


def embedding_centroid_distance_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-pandas variant (the round-1 implementation), kept as the
    small-N baseline. CAUTION: ``applyInPandas`` materializes an entire
    label group in ONE pandas frame — a 100 TB hot label OOMs the
    worker. The default ``embedding_centroid_distance`` below has no
    such bound; prefer it everywhere."""
    emb = T(spark, sf, "embeddings")
    return (
        emb.groupBy("label")
        .applyInPandas(_label_centroid_dist, CENTROID_DIST_SCHEMA)
        .orderBy("label", "vec_id")
    )


def embedding_centroid_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Distance of every vector to its label centroid, with NO
    per-group materialization anywhere (the IVF building block at
    scale):

    1. centroid per label via per-dimension partial AVG — a plain hash
       aggregate, map-side combined, one output row per label no matter
       how hot the label is;
    2. broadcast the (tiny) centroid table back and compute each row's
       distance with JVM-side array expressions (``zip_with`` +
       left-to-right ``aggregate`` fold).

    A pathologically hot label costs exactly one aggregation cell, not
    one worker's memory (pinned by
    tests/test_similarity_centroid.py::test_hot_label_cannot_oom).
    float32 output quantization absorbs the ~1-ulp float64 differences
    between Spark's partial sums, numpy, and the oracle's SUM order.
    """
    emb = T(spark, sf, "embeddings")
    cent = emb.groupBy("label").agg(
        F.array(*[F.avg(F.col("embedding")[i].cast("double")) for i in range(DIM)]).alias(
            "centroid"
        )
    )
    v = _dvec("embedding")
    diff2 = F.zip_with(v, F.col("centroid"), lambda e, c: (e - c) * (e - c))
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x))
    return (
        emb.join(F.broadcast(cent), "label")
        .select("label", "vec_id", dist.cast("float").alias("dist_to_centroid"))
        .orderBy("label", "vec_id")
    )


EMBEDDING_CENTROID_DISTANCE_SQL = f"""
WITH v AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
), cent AS (
  SELECT label, i, AVG(e[i]) AS c
  FROM v, range(1, {DIM + 1}) t(i)
  GROUP BY label, i
), d AS (
  SELECT v.label, v.vec_id,
         sqrt(SUM((v.e[t.i] - cent.c) * (v.e[t.i] - cent.c))) AS dist
  FROM v, range(1, {DIM + 1}) t(i)
  JOIN cent ON cent.label = v.label AND cent.i = t.i
  GROUP BY v.label, v.vec_id
)
SELECT label, vec_id, CAST(dist AS REAL) AS dist_to_centroid
FROM d
ORDER BY label, vec_id
"""


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: the third point on the ANN ladder —
# brute-force (exact baseline) -> LSH (data-independent buckets) ->
# IVF (data-DEPENDENT coarse quantizer, the FAISS IndexIVFFlat shape).
#
# Train: C deterministic seed vectors -> one Lloyd refinement (assign
# every vector to its nearest seed, re-average per cell). Assignment is
# a MAP-ONLY JVM fold: the centroid table is metadata-sized (C x DIM
# doubles), collected once and embedded as an array<struct> literal, so
# finding the nearest cell is `array_min` over per-cell distances — no
# N x C fan-out join, no shuffle. The only shuffles in the whole build
# are the C-row refinement aggregate and the final top-k window.
#
# Cross-engine determinism: refined centroids use decimal(38,6)
# accumulation (exprs.davg pattern) so the per-dim means are exact and
# order-independent — Spark and DuckDB derive bit-identical centroids,
# and every distance is the same left-to-right double fold, so both
# engines assign identical cells and probe identical candidates.

N_CELLS = 16  # coarse-quantizer cells (seeds = vec_id N_QUERIES..N_QUERIES+15)
N_PROBE = 4  # cells each query searches

_DEC = "decimal(38,6)"


def _min_cell(v: F.Column, centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Nearest-cell id via a JVM lexicographic array_min over
    (squared-distance, cell) structs — map-only, no join."""
    entries = [
        F.struct(
            F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in c]), lambda e, s: (e - s) * (e - s)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(cell).alias("cell"),
        )
        for cell, c in centroids
    ]
    return F.array_min(F.array(*entries))


def _refined_centroids(n: DataFrame) -> list[tuple[int, list[float]]]:
    """One Lloyd pass: assign to seed cells, re-average per cell with
    exact decimal sums. Returns the (metadata-sized) refined centroid
    table, deterministically equal to the oracle's."""
    seeds = [
        (int(r["vec_id"]) - N_QUERIES, list(r["v"]))
        for r in n.filter(
            (F.col("vec_id") >= N_QUERIES) & (F.col("vec_id") < N_QUERIES + N_CELLS)
        ).collect()
    ]
    assigned = n.withColumn("cell", _min_cell(F.col("v"), seeds).getField("cell"))
    refined = assigned.groupBy("cell").agg(
        *[
            (F.sum(F.col("v")[i].cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(f"c{i}")
            for i in range(DIM)
        ]
    )
    return sorted(
        (int(r["cell"]), [r[f"c{i}"] for i in range(DIM)]) for r in refined.collect()
    )


def ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    n = _normed(spark, sf)
    cents = _refined_centroids(n)
    data = n.withColumn("cell", _min_cell(F.col("v"), cents).getField("cell"))
    # each query probes its N_PROBE nearest cells: sort the per-cell
    # (dist, cell) structs, slice, explode — still pure JVM expressions
    probe_cells = F.transform(
        F.slice(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            F.aggregate(
                                F.zip_with(
                                    F.col("v"),
                                    F.array(*[F.lit(x) for x in c]),
                                    lambda e, s: (e - s) * (e - s),
                                ),
                                F.lit(0.0),
                                lambda acc, x: acc + x,
                            ).alias("d"),
                            F.lit(cell).alias("cell"),
                        )
                        for cell, c in cents
                    ]
                )
            ),
            1,
            N_PROBE,
        ),
        lambda s: s.getField("cell"),
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.explode(probe_cells).alias("cell"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(q)
        .join(data, ["cell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "rank", "vec_id", "cosine")
        .orderBy("query_id", "rank")
    )


def _dist2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {DIM + 1}),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


# The deterministic coarse-quantizer CTE chain (normalize → seeds →
# one decimal-exact Lloyd pass → final cell assignment `a2`). ONE
# definition shared by every oracle that assigns cells
# (ann_ivf_topk, semdedup_prune, semantic_curated_mix via
# SEM_PRUNED_CTES) — the Spark twin is _refined_centroids/_min_cell,
# also shared; keep them in lockstep.
_QUANTIZER_CTES = f"""n AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), nn AS (
  SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS norm FROM n
), seeds AS (
  SELECT vec_id - {N_QUERIES} AS cell, v AS sv FROM n
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
), a1 AS (
  SELECT vec_id, v, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY {_dist2_sql('v', 'sv')}, cell) AS rn
  FROM n, seeds
), cent AS (
  SELECT cell,
         list(CAST(s AS DOUBLE) / cnt ORDER BY i) AS cv
  FROM (
    SELECT cell, t.i AS i,
           SUM(CAST(v[t.i] AS DECIMAL(38,6))) AS s,
           COUNT(*) AS cnt
    FROM a1, range(1, {DIM + 1}) t(i)
    WHERE rn = 1
    GROUP BY cell, t.i
  )
  GROUP BY cell
), a2 AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY {_dist2_sql('v', 'cv')}, cell) AS rn
  FROM n, cent
)"""

ANN_IVF_TOPK_SQL = f"""
WITH {_QUANTIZER_CTES}, probes AS (
  SELECT q.vec_id AS query_id, cent.cell,
         row_number() OVER (PARTITION BY q.vec_id
                            ORDER BY {_dist2_sql('q.v', 'cv')}, cent.cell) AS rn
  FROM n q, cent
  WHERE q.vec_id < {N_QUERIES}
), scored AS (
  SELECT p.query_id, c.vec_id,
         round({_dot_sql('q.v', 'c.v')} / (q.norm * c.norm), 6) AS cosine
  FROM probes p
  JOIN (SELECT vec_id, cell FROM a2 WHERE rn = 1) asg ON asg.cell = p.cell
  JOIN nn c ON c.vec_id = asg.vec_id
  JOIN nn q ON q.vec_id = p.query_id
  WHERE p.rn <= {N_PROBE} AND c.vec_id <> p.query_id
)
SELECT query_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS INT) AS rank,
       vec_id, cosine
FROM scored
QUALIFY rank <= {TOP_K}
ORDER BY query_id, rank
"""


# --------------------------------------------------------------------------
# SemDeDup-style semantic pruning (Abbas et al. 2023): assign every
# vector to a coarse-quantizer cell (the SAME deterministic one-Lloyd-
# pass quantizer ann_ivf_topk uses), then prune within each cell any
# vector whose cosine to a LOWER-vec_id cell-mate reaches TAU —
# keep-lowest-id is the deterministic stand-in for the paper's
# keep-farthest-from-centroid tiebreak.
#
# Scale shape: the cells BOUND the quadratic — pairwise work is
# Σ|cell|², not N², and the pair generation is a plain equi-join on
# the cell id (shuffle on a short int key; plan-pinned: never a
# cartesian/BNLJ). At 100 TB the cell count grows with the corpus
# (cells ≈ N / target_cell_size), keeping per-cell candidate lists
# executor-sized; a pathologically hot cell is the documented skew
# case — salt the cell key or cap candidates per cell, exactly the
# IVF playbook. Everything is JVM-side zip_with/aggregate folds.

SEM_TAU = 0.35  # calibrated: prunes ~13% of the synthetic corpus


def _sem_assigned(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, cell, v, norm) with every vector assigned to its
    refined coarse-quantizer cell."""
    n = _normed(spark, sf)
    cents = _refined_centroids(n)
    return n.withColumn("cell", _min_cell(F.col("v"), cents).getField("cell"))


def sem_pruned_ids(data: DataFrame) -> DataFrame:
    """The SemDeDup drop set over an assigned frame: vec_ids with a
    lower-vec_id cell-mate at cosine >= SEM_TAU (cell-bounded
    equi-join — shared by semdedup_prune and the curation funnel's
    semantic stage)."""
    keep = data.select(
        "cell",
        F.col("vec_id").alias("keep_id"),
        F.col("v").alias("kv"),
        F.col("norm").alias("kn"),
    )
    cos = F.round(_dot(F.col("kv"), F.col("v")) / (F.col("kn") * F.col("norm")), 6)
    return (
        keep.join(data, ["cell"])
        .filter(F.col("keep_id") < F.col("vec_id"))
        .filter(cos >= SEM_TAU)
        .select("vec_id")
        .distinct()
    )


def semdedup_prune(spark: SparkSession, sf: str) -> DataFrame:
    data = _sem_assigned(spark, sf)
    pruned = sem_pruned_ids(data).withColumn("is_pruned", F.lit(True))
    return (
        data.join(pruned, ["vec_id"], "left")
        .select(
            "vec_id",
            F.col("cell").cast("int").alias("cell"),
            F.coalesce("is_pruned", F.lit(False)).alias("is_pruned"),
        )
        .orderBy("vec_id")
    )


# The CTE chain ending in `pruned` (the SemDeDup drop set) — built on
# the shared _QUANTIZER_CTES and spliced verbatim into the curation
# funnel's semantic-stage oracle so the SQL twins cannot drift.
SEM_PRUNED_CTES = f"""{_QUANTIZER_CTES}, d AS (
  SELECT asg.vec_id, asg.cell, nn.v, nn.norm
  FROM (SELECT vec_id, cell FROM a2 WHERE rn = 1) asg
  JOIN nn ON nn.vec_id = asg.vec_id
), pruned AS (
  SELECT DISTINCT b.vec_id
  FROM d a JOIN d b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round({_dot_sql('a.v', 'b.v')} / (a.norm * b.norm), 6) >= {SEM_TAU}
)"""

SEMDEDUP_PRUNE_SQL = f"""
WITH {SEM_PRUNED_CTES}
SELECT d.vec_id, CAST(d.cell AS INT) AS cell,
       (p.vec_id IS NOT NULL) AS is_pruned
FROM d LEFT JOIN pruned p ON p.vec_id = d.vec_id
ORDER BY d.vec_id
"""


QUERIES = {
    "ann_topk_bruteforce": (ann_topk_bruteforce, ANN_TOPK_BRUTEFORCE_SQL),
    "semdedup_prune": (semdedup_prune, SEMDEDUP_PRUNE_SQL),
    "ann_ivf_topk": (ann_ivf_topk, ANN_IVF_TOPK_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_TOPK_SQL),
    "embedding_centroid_distance": (embedding_centroid_distance, EMBEDDING_CENTROID_DISTANCE_SQL),
}
