"""Sequence packing: map documents to fixed-budget training chunks —
the batch-construction step a pretraining run applies after curation.

Semantics implemented: CONCAT-AND-CUT (the GPT-2/3 recipe): per pack
key, documents are concatenated in deterministic (doc_id) order into
one token stream that is cut every ``TOKEN_BUDGET`` tokens; a document
belongs to the chunk where its first token lands (long docs simply
straddle into the following chunks — nothing is dropped or padded).
This has an exact closed form over a running prefix sum:

    chunk_seq = floor(tokens_before_doc / budget)

so the whole operator is ONE window pass (hash exchange on the pack
key + per-key sort), JVM-only expressions, no UDF and no driver state
— the same plan shape as sessionization, with the same 100-TB
survival argument. The alternative semantics — greedy FIRST-FIT
packing without splitting docs — is a sequential recurrence with
resets (bin totals restart when a doc would overflow) that has NO
prefix-sum closed form; expressing it would need a per-partition
stateful scan (row-at-a-time state), which this engine deliberately
reserves for Arrow-batched paths (see CLAUDE.md's no-per-row-Python
invariant). Concat-and-cut is what the published pipelines run at
scale precisely because it is shuffle+window-shaped and wastes no
tokens to padding.

Outputs a per-chunk rollup: docs starting in the chunk, their token
mass, and the straddle diagnostic (tokens a chunk's docs carry beyond
its own boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table as T

TOKEN_BUDGET = 256  # tokens per packed sequence (sized so the small-SF corpora actually split)

# token-count proxy over the synthetic corpus: whitespace tokens
_N_TOK_DUCK = "len(string_split(lower(text), ' '))"


def chunk_assign(
    df: DataFrame, key_cols: list[str], order_col: str, n_tok_col: str, budget: int
) -> DataFrame:
    """Concat-and-cut chunk assignment: adds ``chunk_seq`` (0-based per
    key) and ``tok_before`` (the doc's start offset in its key's
    concatenated stream)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum(n_tok_col).over(w) - F.col(n_tok_col)
    return df.withColumn("tok_before", before).withColumn(
        "chunk_seq", F.floor(F.col("tok_before") / budget)
    )


def packed_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Per-chunk rollup of concat-and-cut packing over documents
    (whitespace-token proxy, per-source streams): how many docs start
    in each chunk, their token mass, and how far the last doc straddles
    past the chunk boundary."""
    docs = T(spark, sf, "documents").select(
        "doc_id", "source", F.size(F.split(F.lower("text"), " ")).alias("n_tok")
    )
    packed = chunk_assign(docs, ["source"], "doc_id", "n_tok", TOKEN_BUDGET)
    end_beyond = F.col("tok_before") + F.col("n_tok") - (F.col("chunk_seq") + 1) * TOKEN_BUDGET
    return (
        packed.groupBy("source", "chunk_seq")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("doc_tokens"),
            F.max(F.greatest(end_beyond, F.lit(0))).alias("straddle_tokens"),
        )
        .orderBy("source", "chunk_seq")
    )


PACKED_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT doc_id, source, {_N_TOK_DUCK} AS n_tok FROM documents
), packed AS (
  SELECT source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) - n_tok AS tok_before
  FROM toks
), chunks AS (
  SELECT source, n_tok, tok_before,
         CAST(FLOOR(tok_before / {TOKEN_BUDGET}) AS BIGINT) AS chunk_seq
  FROM packed
)
SELECT source, chunk_seq,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS doc_tokens,
       CAST(max(GREATEST(tok_before + n_tok - (chunk_seq + 1) * {TOKEN_BUDGET}, 0))
            AS BIGINT) AS straddle_tokens
FROM chunks
GROUP BY source, chunk_seq
ORDER BY source, chunk_seq
"""


QUERIES = {
    "packed_sequences": (packed_sequences, PACKED_SEQUENCES_SQL),
}
