"""CCNet-style unigram-LM perplexity quality filter.

The standard pre-training curation step this models (CCNet, Wenzek et
al., arXiv:1911.00359): train a language model on a trusted reference
corpus (Wikipedia in the paper), score every candidate document by
perplexity under it, and split the corpus into head / middle / tail
buckets at fixed perplexity percentiles — head being the most
in-domain slice. Real pipelines use a 5-gram KenLM; the deterministic,
cross-engine-checkable stand-in here is an add-one-smoothed unigram LM
trained on a fixed reference slice of ``documents`` (sources with
id % 4 == 0, the same closed-form source arithmetic
``training_mix_sample`` uses), with per-document cross-entropy in nats
and tertile bucketing. The operator contract — build LM, broadcast it,
score every doc with a left join, bucket by global percentile cutoffs —
is exactly the shape a learned LM plugs into.

Cross-engine determinism (the module-wide rules from textops.py):
tokenization is bit-identical to ``vocab_top_words`` (split on single
space, drop empties); every per-occurrence log term is rounded to 6
decimals BEFORE aggregation; sums of doubles accumulate as
decimal(38,6) (functions/exprs.davg); DuckDB integer sums are cast to
BIGINT (HUGEINT/pandas-dtype rule); final floats rounded to 6.

Scale shape (100 TB audit):
- The wide ``text`` column never shuffles: the explode projects only
  (doc_id, source, word); text stays in the scan.
- The LM is vocab-sized (sublinear in corpus bytes) and joins via a
  size-gated broadcast (util.broadcast_if_small) — at a 10M-entry
  vocab the hint lapses and AQE picks a shuffle join on (word, cnt),
  still narrow.
- The per-document aggregate shuffles only (doc_id, source, nlp,
  known) — fixed-width rows.
- The global tertile cutoffs are a 2-double aggregate cross-joined
  back as a 1-row broadcast. Exact ``percentile`` keeps oracle parity
  at test scale; the 100-TB path is ``approx_percentile`` (bounded-
  state KLL, same cutoff-broadcast shape) or CCNet's actual practice —
  fixed thresholds calibrated offline — both of which remove the only
  global sort in the plan.

Reference parity note: the reference repo has no LM scorer; this is
part of the training-data operator surface the brief adds on top of
the reference's ETL semantics (like textops/dedup_text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exprs import davg
from ..sources.readers import load_table as T
from .util import broadcast_if_small, persist_replacing, spread

# Sources whose id ≡ 0 (mod 4) form the trusted reference slice the LM
# trains on: src0, src4, src8, ... — 1/4 of the corpus, disjoint from
# nothing (scored docs include the slice itself, as in CCNet where
# Wikipedia itself scores as deep head).
LM_SOURCE_MOD = 4

# Tertile fractions as explicit literals so both engines interpolate
# from the identical double.
T1_FRAC, T2_FRAC = 0.333333, 0.666667


def _per_doc_cross_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """(doc_id, source, n_words, known_frac, cross_entropy) — the shared
    LM-build + scoring pipeline behind both the tertile filter and the
    approx-cutoff gate; persisted (per-invocation slot) because every
    consumer aggregates it at least twice."""
    docs = spread(spark, T(spark, sf, "documents"))
    word = F.explode(F.split(F.lower("text"), " ")).alias("word")
    words = docs.select("doc_id", "source", word).filter(F.length("word") > 0)
    # reused by the LM build and the scoring join
    words = persist_replacing("lm_words", sf, words)

    lm = (
        words.filter(F.substring("source", 4, 10).cast("int") % LM_SOURCE_MOD == 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    totals = lm.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("tot_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )

    # add-one smoothing: p(w) = (cnt+1) / (tot + V + 1); OOV cnt = 0.
    # Rounded per occurrence so the decimal accumulation is over
    # engine-identical values.
    nlp = F.round(
        F.log(F.col("tot_tokens") + F.col("vocab") + F.lit(1))
        - F.log(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)),
        6,
    )
    scored = (
        words.join(broadcast_if_small(lm), "word", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "source",
            nlp.alias("nlp"),
            F.col("cnt").isNotNull().cast("int").alias("known"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.round(F.sum("known") / F.count(F.lit(1)), 6).alias("known_frac"),
        F.round(davg("nlp"), 6).alias("cross_entropy"),
    )
    # reused by the cutoff aggregate and the final bucketing
    return persist_replacing("lm_perdoc", sf, per_doc)


def lm_perplexity_filter(spark: SparkSession, sf: str) -> DataFrame:
    per_doc = _per_doc_cross_entropy(spark, sf)

    cuts = per_doc.agg(
        F.round(F.percentile("cross_entropy", F.lit(T1_FRAC)), 6).alias("t1"),
        F.round(F.percentile("cross_entropy", F.lit(T2_FRAC)), 6).alias("t2"),
    )
    bucket = (
        F.when(F.col("cross_entropy") <= F.col("t1"), "head")
        .when(F.col("cross_entropy") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return (
        per_doc.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "source",
            "n_words",
            "known_frac",
            "cross_entropy",
            bucket.alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


# The WITH-chain through per_doc, shared by the tertile filter's
# oracle and the approx-cutoff gate's oracle (must stay bit-identical
# between them — the approx gate's exact columns are only comparable
# because the pipeline is the same text).
_LM_PER_DOC_CTE = f"""
WITH words AS (
  SELECT doc_id, source, word
  FROM (SELECT doc_id, source,
               unnest(string_split(lower(text), ' ')) AS word
        FROM documents)
  WHERE length(word) > 0
), lm AS (
  SELECT word, count(*) AS cnt
  FROM words
  WHERE CAST(substring(source, 4) AS INT) % {LM_SOURCE_MOD} = 0
  GROUP BY word
), tot AS (
  SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS tot_tokens,
         count(*) AS vocab
  FROM lm
), scored AS (
  SELECT w.doc_id, w.source,
         round(ln(t.tot_tokens + t.vocab + 1)
               - ln(coalesce(l.cnt, 0) + 1), 6) AS nlp,
         CASE WHEN l.cnt IS NULL THEN 0 ELSE 1 END AS known
  FROM words w
  LEFT JOIN lm l USING (word)
  CROSS JOIN tot t
), per_doc AS (
  SELECT doc_id, source,
         count(*) AS n_words,
         round(CAST(sum(known) AS BIGINT) / count(*), 6) AS known_frac,
         round(CAST(SUM(CAST(nlp AS DECIMAL(38,6))) AS DOUBLE) / count(*), 6)
           AS cross_entropy
  FROM scored
  GROUP BY doc_id, source
)
"""

LM_PERPLEXITY_FILTER_SQL = f"""{_LM_PER_DOC_CTE},
cuts AS (
  SELECT round(quantile_cont(cross_entropy, {T1_FRAC}), 6) AS t1,
         round(quantile_cont(cross_entropy, {T2_FRAC}), 6) AS t2
  FROM per_doc
)
SELECT doc_id, source, n_words, known_frac, cross_entropy,
       CASE WHEN cross_entropy <= t1 THEN 'head'
            WHEN cross_entropy <= t2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM per_doc CROSS JOIN cuts
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# The bounded-state cutoff path, driver-gated (VERDICT r4 task 3): the
# exact global `percentile` above is the module's one global sort; the
# 100-TB formulation swaps it for `approx_percentile` (mergeable KLL
# sketch, O(1) state). Same tolerance-banded-oracle scheme as
# textops.doc_length_percentiles_approx: Spark emits booleans checking
# the sketch cutoffs against exact interpolated percentiles at
# (frac ± CUT_BAND); DuckDB emits literal TRUE — the driver value-hash
# passes iff the sketch met the band. `head_frac_ok` additionally
# pins the END-TO-END property the cutoffs exist for: bucketing by the
# approx t1 yields a head fraction ≥ T1_FRAC − CUT_BAND (the sketch's
# rank guarantee transfers: the returned cutoff is an element whose
# rank is ≥ (T1−ε)N, and F(v) ≥ rank(v)/N regardless of ties; the
# symmetric upper bound does NOT survive ties, so it's deliberately
# not asserted).

CUT_ACC = 10_000
CUT_BAND = 0.02


def lm_cutoffs_approx(spark: SparkSession, sf: str) -> DataFrame:
    per_doc = _per_doc_cross_entropy(spark, sf)
    fracs = [T1_FRAC, T2_FRAC]
    ap = F.percentile_approx(
        F.col("cross_entropy"), F.array(*[F.lit(f) for f in fracs]), F.lit(CUT_ACC)
    )
    lo = F.percentile(
        F.col("cross_entropy"),
        F.array(*[F.lit(round(f - CUT_BAND, 6)) for f in fracs]),
    )
    hi = F.percentile(
        F.col("cross_entropy"),
        F.array(*[F.lit(round(f + CUT_BAND, 6)) for f in fracs]),
    )
    row = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.percentile("cross_entropy", F.lit(T1_FRAC)), 6).alias("t1_exact"),
        F.round(F.percentile("cross_entropy", F.lit(T2_FRAC)), 6).alias("t2_exact"),
        ap.alias("_ap"),
        lo.alias("_lo"),
        hi.alias("_hi"),
    )
    head = (
        per_doc.crossJoin(F.broadcast(row.select(F.col("_ap")[0].alias("_t1a"))))
        .agg(
            F.round(
                F.sum((F.col("cross_entropy") <= F.col("_t1a")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("head_frac")
        )
    )

    def in_band(i: int):
        return (F.col("_ap")[i] >= F.col("_lo")[i]) & (
            F.col("_ap")[i] <= F.col("_hi")[i]
        )

    return row.crossJoin(F.broadcast(head)).select(
        "n_docs",
        "t1_exact",
        "t2_exact",
        in_band(0).alias("t1_in_band"),
        in_band(1).alias("t2_in_band"),
        (F.col("head_frac") >= F.lit(round(T1_FRAC - CUT_BAND, 6))).alias(
            "head_frac_ok"
        ),
    )


LM_CUTOFFS_APPROX_SQL = f"""{_LM_PER_DOC_CTE}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       round(quantile_cont(cross_entropy, {T1_FRAC}), 6) AS t1_exact,
       round(quantile_cont(cross_entropy, {T2_FRAC}), 6) AS t2_exact,
       TRUE AS t1_in_band,
       TRUE AS t2_in_band,
       TRUE AS head_frac_ok
FROM per_doc
"""

QUERIES = {
    "lm_perplexity_filter": (lm_perplexity_filter, LM_PERPLEXITY_FILTER_SQL),
    "lm_cutoffs_approx": (lm_cutoffs_approx, LM_CUTOFFS_APPROX_SQL),
}
