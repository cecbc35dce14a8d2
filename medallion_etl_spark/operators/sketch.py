"""Mergeable distinct-count sketches for rollup tables.

Two variants of the same KPI (distinct users per event type + the
merged ALL row):

- ``kmv_distinct_users``: a K-minimum-values sketch (Bar-Yossef et al.
  2002) built from md5 hashes — keep the K smallest distinct hash
  values per group; estimate = (K-1) / frac(K-th smallest). Unlike
  HLL, KMV over a fixed hash is fully DETERMINISTIC, so the DuckDB
  oracle reproduces it bit-for-bit — this is the oracle-checkable
  sketch. Mergeability is demonstrated in-query: the ``__ALL__`` row
  is computed by merging the per-group sketches (union the kept
  hashes, re-take the K smallest), never by rescanning the input —
  exactly how a 100 TB rollup tree folds partial sketches upward.
- ``hll_distinct_users``: the production path — Spark 4's built-in
  Apache DataSketches HLL (``hll_sketch_agg``), a binary, mergeable
  sketch column. Raw estimates are library-specific, so the oracle
  compares group keys + exact counts + a deterministic within-5%
  boolean (DuckDB emits literal TRUE); the tight accuracy bound is
  pinned by pytest against exact counts.

Scale shape (KMV): the shuffle carries (group, 32-char digest) pairs
only — distinct-reduced map-side by the partial aggregate Spark plans
for DISTINCT — and the per-group sort that ranks hashes is bounded by
the group's distinct count. A production deployment at extreme
cardinality would fold min-K partially per partition (a JVM Aggregator
or the HLL variant); the HLL entry IS that path, built in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

K = 64
_FRAC_DEN = float(16**12)  # 12 hex digits < 2^48: exact in double on both engines


def _frac(h: F.Column) -> F.Column:
    """md5 hex digest -> uniform (0,1) fraction of its first 12 hex
    digits. conv() yields a decimal string; the double cast is exact
    below 2^53."""
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("double") / F.lit(_FRAC_DEN)


# same fraction in DuckDB: left fold acc*16 + digit over the hex chars
_FRAC_SQL = (
    "(list_reduce(list_transform(range(1, 13), i -> "
    "CAST(strpos('0123456789abcdef', {h}[i:i]) - 1 AS DOUBLE)), "
    f"(a, b) -> a * 16 + b) / {_FRAC_DEN!r})"
)


def _estimate(n_kept: F.Column, kth: F.Column) -> F.Column:
    # sketch not full -> it saw every distinct value: exact count
    return F.when(n_kept < K, n_kept.cast("double")).otherwise(
        F.round(F.lit(float(K - 1)) / _frac(kth), 6)
    )


def kmv_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(source, n_kept, kmv_estimate, exact_distinct) per group plus the
    merged ``__ALL__`` row — the reusable sketch core; see module doc."""
    # NULL values are not distinct members (SQL COUNT(DISTINCT)
    # ignores them) and their NULL hash would rank NULLS FIRST in
    # Spark but NULLS LAST in DuckDB — filter before hashing so the
    # kept sets agree cross-engine
    ev = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("source"),
        F.md5(F.encode(F.col(value_col).cast("string"), "UTF-8")).alias("h"),
    )
    h = ev.distinct()
    rn = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    kept = h.withColumn("rn", rn).filter(F.col("rn") <= K)
    exact = h.groupBy("source").agg(F.count(F.lit(1)).alias("exact_distinct"))
    per_source = (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth"))
        .join(exact, "source")
    )
    # __ALL__ = merge of the per-source sketches: k smallest of the
    # union of kept hashes (each group's min-K contains every global
    # min-K member from that group) — the input is never rescanned
    merged_kept = (
        kept.select("h").distinct().orderBy("h").limit(K)
    )
    merged = merged_kept.agg(
        F.lit("__ALL__").alias("source"),
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth"),
    ).crossJoin(h.select("h").distinct().agg(F.count(F.lit(1)).alias("exact_distinct")))
    both = per_source.unionByName(merged)
    return both.select(
        "source",
        F.col("n_kept").cast("int").alias("n_kept"),
        _estimate(F.col("n_kept"), F.col("kth")).alias("kmv_estimate"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
    ).orderBy("source")


def kmv_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    return kmv_by_group(T(spark, sf, "events"), "event_type", "user_id")


KMV_DISTINCT_USERS_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type AS source, md5(CAST(user_id AS VARCHAR)) AS h
  FROM events WHERE user_id IS NOT NULL
),
ranked AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM h
),
kept AS (SELECT source, h FROM ranked WHERE rn <= {K}),
per_source AS (
  SELECT k.source, count(*) AS n_kept, max(k.h) AS kth, e.exact_distinct
  FROM kept k
  JOIN (SELECT source, count(*) AS exact_distinct FROM h GROUP BY 1) e
    ON e.source = k.source
  GROUP BY k.source, e.exact_distinct
),
merged_kept AS (
  SELECT h FROM (SELECT DISTINCT h FROM kept) ORDER BY h LIMIT {K}
),
merged AS (
  SELECT '__ALL__' AS source, count(*) AS n_kept, max(h) AS kth,
         (SELECT count(DISTINCT h) FROM h) AS exact_distinct
  FROM merged_kept
),
unioned AS (SELECT * FROM per_source UNION ALL SELECT * FROM merged)
SELECT source,
       CAST(n_kept AS INT) AS n_kept,
       CASE WHEN n_kept < {K} THEN CAST(n_kept AS DOUBLE)
            ELSE round({float(K - 1)} / {_FRAC_SQL.format(h='kth')}, 6)
       END AS kmv_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct
FROM unioned
ORDER BY source
"""


def hll_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """Production sketch path: DataSketches HLL per group, merged via
    ``hll_union_agg`` for the ALL row — binary sketches a rollup tree
    folds without touching raw data. The raw estimate is
    library-specific, so the ORACLE-compared columns are the group
    keys, the exact distinct count, and ``hll_ok`` — the deterministic
    within-5% check (lgK=12 HLL has ~1.6% RSE; the tight bound is
    pinned in tests/test_sketch.py). DuckDB's side is the exact count
    plus a literal TRUE, so a drifting estimate turns the row red."""
    ev = T(spark, sf, "events").select(
        F.col("event_type").alias("source"), F.col("user_id")
    )
    per = ev.groupBy("source").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact_distinct"),
    )
    merged = per.agg(
        F.lit("__ALL__").alias("source"),
        F.hll_union_agg("sk").alias("sk"),
    )
    all_exact = ev.agg(F.count_distinct("user_id").alias("e"))
    merged = merged.crossJoin(F.broadcast(all_exact)).select(
        "source", "sk", F.col("e").alias("exact_distinct")
    )
    est = F.hll_sketch_estimate("sk")
    return (
        per.unionByName(merged)
        .select(
            "source",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            (
                F.abs(est - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("hll_ok"),
        )
        .orderBy("source")
    )


HLL_DISTINCT_USERS_SQL = """
WITH per AS (
  SELECT event_type AS source, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY 1
),
allrow AS (
  SELECT '__ALL__' AS source, count(DISTINCT user_id) AS exact_distinct
  FROM events
)
SELECT source, CAST(exact_distinct AS BIGINT) AS exact_distinct,
       TRUE AS hll_ok
FROM (SELECT * FROM per UNION ALL SELECT * FROM allrow)
ORDER BY source
"""


QUERIES = {
    "kmv_distinct_users": (kmv_distinct_users, KMV_DISTINCT_USERS_SQL),
    "hll_distinct_users": (hll_distinct_users, HLL_DISTINCT_USERS_SQL),
}


# --------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): FREQUENCY estimates
# with fixed memory, completing the mergeable-sketch family (KMV/HLL
# cover distinct counts). The sketch is a D x W counter grid; counters
# ADD, so partial sketches from any partitioning/rollup level merge by
# summation — demonstrated by test_sketch.py's split-merge property.
# Estimates are one-sided: est >= true always, with overcounts only
# from bucket collisions.
#
# Deterministic md5-based row hashes make the WHOLE pipeline (grid AND
# estimates) reproducible in DuckDB, so unlike library HLL this sketch
# is oracle-gated end to end.
#
# Scale shape: the grid build is one explode (D small structs per
# word) + one hash aggregate -> at most D*W rows regardless of corpus
# size; the estimate join broadcasts the grid (it is the SMALL side by
# construction). Text never shuffles; words do.

CMS_D = 4
CMS_W = 1024


def _cms_bucket(word: F.Column, row: int) -> F.Column:
    from ..functions.exprs import md5_bucket

    return md5_bucket(F.concat(F.lit(f"{row}|"), word), CMS_W)


def _rb_explode(word: F.Column) -> F.Column:
    """The exploded (row, bucket) struct for one word — the ONE
    definition of the probe/grid cell derivation (grid build and
    estimate probes must hash identically or estimates silently read
    foreign cells)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"), _cms_bucket(word, r).alias("bucket")
                )
                for r in range(CMS_D)
            ]
        )
    )


def cms_grid(words: DataFrame, weight: str | None = None) -> DataFrame:
    """The D x W counter grid for a frame with a ``word`` column —
    at most CMS_D * CMS_W rows however large the input. Grids merge by
    per-cell SUM (test_sketch.py pins split-build-merge ≡ one build).
    ``weight``: build from pre-aggregated (word, count) rows instead of
    raw occurrences — a cell's count is exactly the sum of the counts
    of the words hashing to it, so the two are identical by
    construction."""
    one = F.lit(1) if weight is None else F.col(weight)
    return (
        words.select(_rb_explode(F.col("word")).alias("rb"), one.alias("_w"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_word_counts(spark: SparkSession, sf: str) -> DataFrame:
    from .util import spread

    docs = spread(spark, T(spark, sf, "documents"))
    words = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("word")
    ).filter(F.length("word") > 0)
    # ONE corpus pass: the exact per-word counts feed BOTH the grid
    # (count-weighted cell sums — identical to counting occurrences)
    # and the probes; here the probe list is the full (small) vocab,
    # production probes a candidate list against the same grid.
    truth = words.groupBy("word").agg(F.count(F.lit(1)).alias("true_count"))
    grid = cms_grid(truth, weight="true_count")
    probes = truth.select(
        "word", "true_count", _rb_explode(F.col("word")).alias("rb")
    ).select("word", "true_count", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(grid), ["row", "bucket"])
        .groupBy("word", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    return est.select(
        "word",
        "est_count",
        "true_count",
        (F.col("est_count") - F.col("true_count")).alias("overcount"),
    ).orderBy("word")


from ..functions.exprs import md5_bucket_sql as _mbs  # noqa: E402

_CMS_BUCKET_SQL = _mbs("concat(CAST({r} AS VARCHAR), '|', word)", CMS_W)

_CMS_ROWS_SQL = ", ".join(
    f"({r}, {_CMS_BUCKET_SQL.format(r=r)})" for r in range(CMS_D)
)

CMS_WORD_COUNTS_SQL = f"""
WITH words AS (
  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents
), w AS (
  SELECT word FROM words WHERE length(word) > 0
), truth AS (
  SELECT word, count(*) AS true_count FROM w GROUP BY word
), rb AS (
  SELECT word, true_count, u.r AS row, u.b AS bucket
  FROM truth, LATERAL (SELECT unnest([{_CMS_ROWS_SQL}], recursive := true)) AS u(r, b)
), grid AS (
  SELECT row, bucket, CAST(sum(true_count) AS BIGINT) AS cnt FROM rb GROUP BY row, bucket
), probes AS (
  SELECT t.word, t.true_count, u.r AS row, u.b AS bucket
  FROM truth t, LATERAL (SELECT unnest([{_CMS_ROWS_SQL}], recursive := true)) AS u(r, b)
)
SELECT p.word,
       min(g.cnt) AS est_count,
       p.true_count,
       min(g.cnt) - p.true_count AS overcount
FROM probes p JOIN grid g ON g.row = p.row AND g.bucket = p.bucket
GROUP BY p.word, p.true_count
ORDER BY word
"""

QUERIES["cms_word_counts"] = (cms_word_counts, CMS_WORD_COUNTS_SQL)
