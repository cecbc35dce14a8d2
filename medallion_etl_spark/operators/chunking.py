"""Sliding-window document chunking: split each document into
fixed-size token windows with stride overlap — the standard
long-context preprocessing step (BERT-style striding / RAG chunking),
and the per-document complement of the cross-document concat-and-cut
in operators/packing.py.

Semantics: a document with ``n_tok`` tokens yields chunks starting at
offsets ``k * STRIDE`` for ``k = 0 .. n_chunks-1`` where

    n_chunks = 1 + ceil(max(n_tok - WINDOW, 0) / STRIDE)

i.e. full ``WINDOW``-token chunks every ``STRIDE`` tokens, plus a
(possibly shorter) tail chunk so the last token is always covered;
consecutive chunks overlap by ``WINDOW - STRIDE`` tokens. The whole
operator is an exact integer closed form: per-row arithmetic plus one
``sequence``/``explode`` — MAP-ONLY, no join, no shuffle, no UDF
(plan-pinned in tests/test_chunking.py), so at 100 TB it runs at scan
speed and parallelises with the input splits; the only caveat is the
same one as every cheap map over a small hot table (CLAUDE.md): give
Spark enough input splits.

The reference has no chunking step (its grain is already transactional
rows); this operator exists for the training-data-pipeline surface the
north rule adds over pre-tokenized sequences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

WINDOW = 32  # tokens per chunk (sized so the small-SF corpus multi-chunks)
STRIDE = 24  # chunk start spacing; WINDOW - STRIDE = 8 tokens of overlap

# token-count proxy over the synthetic corpus: whitespace tokens
# (identical to operators/packing.py so the two stay comparable)
_N_TOK_DUCK = "len(string_split(lower(text), ' '))"


def chunk_spans(df: DataFrame, n_tok_col: str, window: int, stride: int) -> DataFrame:
    """Explode each row into its sliding-window chunk spans: adds
    ``chunk_idx`` (0-based), ``tok_start``, ``chunk_tokens`` and
    ``is_tail`` (1 on the final chunk). Pure map-side closed form."""
    overhang = F.greatest(F.col(n_tok_col) - F.lit(window), F.lit(0))
    n_chunks = F.lit(1) + F.floor((overhang + F.lit(stride - 1)) / F.lit(stride))
    df = df.withColumn("_n_chunks", n_chunks.cast("long"))
    df = df.withColumn(
        "chunk_idx",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("_n_chunks") - F.lit(1))),
    )
    tok_start = F.col("chunk_idx") * F.lit(stride)
    return (
        df.withColumn("tok_start", tok_start)
        .withColumn(
            "chunk_tokens",
            F.least(F.lit(window).cast("long"), F.col(n_tok_col) - tok_start),
        )
        .withColumn(
            "is_tail", (F.col("chunk_idx") == F.col("_n_chunks") - F.lit(1)).cast("int")
        )
        .drop("_n_chunks")
    )


def doc_chunk_inventory(spark: SparkSession, sf: str) -> DataFrame:
    """Per-chunk inventory of sliding-window chunking over documents
    (whitespace-token proxy): every (doc, chunk) span with its start
    offset, length, and tail flag."""
    docs = T(spark, sf, "documents").select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).cast("long").alias("n_tok")
    )
    return chunk_spans(docs, "n_tok", WINDOW, STRIDE).select(
        "doc_id", "chunk_idx", "tok_start", "chunk_tokens", "is_tail"
    )


DOC_CHUNK_INVENTORY_SQL = f"""
WITH toks AS (
  SELECT doc_id, CAST({_N_TOK_DUCK} AS BIGINT) AS n_tok FROM documents
), counted AS (
  SELECT doc_id, n_tok,
         1 + CAST(FLOOR((GREATEST(n_tok - {WINDOW}, 0) + {STRIDE - 1}) / {STRIDE})
                  AS BIGINT) AS n_chunks
  FROM toks
), exploded AS (
  SELECT doc_id, n_tok, n_chunks,
         UNNEST(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM counted
)
SELECT doc_id,
       chunk_idx,
       chunk_idx * {STRIDE} AS tok_start,
       LEAST({WINDOW}, n_tok - chunk_idx * {STRIDE}) AS chunk_tokens,
       CAST(chunk_idx = n_chunks - 1 AS INT) AS is_tail
FROM exploded
"""


QUERIES = {
    "doc_chunk_inventory": (doc_chunk_inventory, DOC_CHUNK_INVENTORY_SQL),
}
