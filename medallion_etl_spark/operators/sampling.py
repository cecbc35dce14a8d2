"""Corpus sampling operators: stratified per-source sampling and
temperature-based source mixing.

Two standard training-data-build steps the mix/selection family was
missing:

- ``stratified_sample_k``: exactly K documents per source, chosen by a
  deterministic pseudo-random order (md5 of doc_id) — the "inspect a
  fixed random sample of every slice" operator every corpus QA loop
  runs, and the per-stratum variant of ``training_mix_sample``'s
  rate-based filter.
- ``temperature_mix_weights``: per-source sampling weights ∝
  (token count)^α with α = 0.5 — the GPT-3/Pile-style temperature
  reweighting that upsamples small high-quality sources relative to
  their natural share. α is spelled ``sqrt`` deliberately: IEEE-754
  requires sqrt to be correctly rounded, so Spark (JVM) and DuckDB (C)
  produce the identical double, whereas a general ``pow(x, 0.7)`` is
  not so guaranteed.

Scale shape (100 TB audit):
- stratified_sample_k shuffles only (doc_id, source) pairs — the text
  column is pruned at the scan; the per-stratum sort is a row_number
  window keyed by source. With huge strata and small K, the scale path
  is a pre-filter on the hash prefix (keep md5 < t where t ≈
  c·K/|stratum|) before the window, cutting the sort input to ~cK rows
  per stratum; the window formulation is unchanged.
- temperature_mix_weights is one narrow hash agg to |sources| rows;
  everything after operates on that tiny frame (1-row total broadcast
  back). Rounded weights accumulate as decimal(38,6) (module parity
  rules in textops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exprs import DEC
from ..sources.readers import load_table as T
from .util import persist_replacing, spread

SAMPLE_K = 5
# temperature alpha = 0.5, spelled sqrt for cross-engine exactness
TEMP_ALPHA_DOC = "0.5 (sqrt)"


def stratified_sample_k(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents").select("doc_id", "source")
    shuffle_key = F.md5(F.encode(F.col("doc_id").cast("string"), "UTF-8"))
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(shuffle_key, F.col("doc_id"))
    )
    return (
        docs.select("doc_id", "source", rank.alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .orderBy("source", "sample_rank")
    )


STRATIFIED_SAMPLE_K_SQL = f"""
SELECT doc_id, source, sample_rank
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_K}
ORDER BY source, sample_rank
"""


def temperature_mix_weights(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(spark, T(spark, sf, "documents"))
    n_tok = F.size(F.split(F.lower("text"), " "))
    per_src = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("n_toks"),
        )
        .withColumn("w6", F.round(F.sqrt("n_toks"), 6))
    )
    # tiny (|sources| rows) but feeds both the total and the output
    per_src = persist_replacing("temp_mix", sf, per_src)
    tot = per_src.agg(
        F.sum(F.col("w6").cast(DEC)).cast("double").alias("wsum"),
        F.sum("n_toks").alias("all_toks"),
    )
    weight = F.round(F.col("w6") / F.col("wsum"), 6)
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_toks",
            weight.alias("mix_weight"),
            F.floor(weight * F.col("all_toks")).alias("expected_toks"),
        )
        .orderBy("source")
    )


TEMPERATURE_MIX_WEIGHTS_SQL = """
WITH per_src AS (
  SELECT source,
         count(*) AS n_docs,
         CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_toks
  FROM documents
  GROUP BY source
), w AS (
  SELECT *, round(sqrt(n_toks), 6) AS w6 FROM per_src
), tot AS (
  SELECT CAST(SUM(CAST(w6 AS DECIMAL(38,6))) AS DOUBLE) AS wsum,
         CAST(sum(n_toks) AS BIGINT) AS all_toks
  FROM w
)
SELECT source, n_docs, n_toks,
       round(w6 / wsum, 6) AS mix_weight,
       CAST(floor(round(w6 / wsum, 6) * all_toks) AS BIGINT) AS expected_toks
FROM w CROSS JOIN tot
ORDER BY source
"""

QUERIES = {
    "stratified_sample_k": (stratified_sample_k, STRATIFIED_SAMPLE_K_SQL),
    "temperature_mix_weights": (temperature_mix_weights, TEMPERATURE_MIX_WEIGHTS_SQL),
}


# --------------------------------------------------------------------------
# Deterministic train/val/test split: hash-of-key assignment, the
# leak-free standard for corpus splits. Keyed on doc_id (never on
# position or random()), so the assignment is (1) stable under corpus
# growth and re-partitioning — a doc keeps its split forever, which is
# what prevents eval contamination across dataset releases; (2)
# reproducible on any engine that can compute md5 (the oracle below is
# the proof); (3) free at 100 TB — one per-row codegen expression at
# scan speed, no shuffle, no sampling pass. The salt versions the
# split: bumping it is an explicit, global re-split, the only way a
# doc may ever change sides.

SPLIT_SALT = "split-v1"
SPLIT_PER_MILLE_TRAIN = 980  # 98% train
SPLIT_PER_MILLE_VAL = 990  # 1% val, 1% test


def split_assign(df: DataFrame, key_col: str) -> DataFrame:
    """Library form: add ``split_bucket`` (0-999) + ``split`` columns
    keyed on ``key_col``; works over any keyed frame (corpus tables,
    LakeTable reads, feed outputs)."""
    from ..functions.exprs import md5_bucket

    b = md5_bucket(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + SPLIT_SALT)), 1000
    )
    return df.withColumn("split_bucket", b).withColumn(
        "split",
        F.when(F.col("split_bucket") < SPLIT_PER_MILLE_TRAIN, F.lit("train"))
        .when(F.col("split_bucket") < SPLIT_PER_MILLE_VAL, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def train_val_test_split(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    return (
        split_assign(docs, "doc_id")
        .select("doc_id", "split_bucket", "split", "source")
        .orderBy("doc_id")
    )


def _split_sql() -> str:
    from ..functions.exprs import md5_bucket_sql

    b = md5_bucket_sql(f"concat(CAST(doc_id AS VARCHAR), ':{SPLIT_SALT}')", 1000)
    return f"""
SELECT doc_id,
       {b} AS split_bucket,
       CASE WHEN {b} < {SPLIT_PER_MILLE_TRAIN} THEN 'train'
            WHEN {b} < {SPLIT_PER_MILLE_VAL} THEN 'val'
            ELSE 'test' END AS split,
       source
FROM documents
ORDER BY doc_id
"""


TRAIN_VAL_TEST_SPLIT_SQL = _split_sql()

QUERIES["train_val_test_split"] = (train_val_test_split, TRAIN_VAL_TEST_SPLIT_SQL)
