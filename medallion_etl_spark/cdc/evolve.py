"""Schema evolution: add-column and type-widen, applied on read/write.

Reference analog: dbmate migrations (reference sql/migrations/ —
add_factor_hectolitros, add_telefonos are add-column; the PK/constraint
fixes are key widening). In this engine evolution is a metadata event:
the table's ``schema_version`` bumps, old data files stay as written,
and ``align_to_version`` reconciles any frame to the target version:

    v1 -> v2   add nullable ``lang`` (missing column -> NULL)
    v2 -> v3   widen ``n_tok`` int32 -> int64 (cast on read)

Widening casts are lossless by construction; narrowing is refused.
"""

from __future__ import annotations

from collections.abc import Collection

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import DOCS_SCHEMAS


def aligned_cols(have: Collection[str], to_version: int) -> list[Column]:
    """THE one alignment rule (add-column -> NULL, cast to target
    type), as a column list so callers can append bookkeeping columns
    (``_lsn``/``_deleted``) in the same select. Every alignment in the
    engine — read-time, upsert payloads, merge layout — goes through
    here so a schema change is reconciled in exactly one place."""
    return [
        (
            F.col(f.name).cast(f.dataType)
            if f.name in have
            else F.lit(None).cast(f.dataType)
        ).alias(f.name)
        for f in DOCS_SCHEMAS[to_version].fields
    ]


def align_to_version(df: DataFrame, from_version: int, to_version: int) -> DataFrame:
    """Project ``df`` (shaped like DOCS_SCHEMAS[from_version]) onto
    DOCS_SCHEMAS[to_version]. Narrowing (int64 -> int32 etc.) would be
    lossy and is refused."""
    if to_version < from_version:
        raise ValueError(f"cannot narrow schema v{from_version} -> v{to_version}")
    return df.select(*aligned_cols(set(df.columns), to_version))


def align_frame(df: DataFrame, to_version: int) -> DataFrame:
    """Align an arbitrary frame carrying some subset of doc columns to
    the target schema version (used for upsert payloads)."""
    return df.select(*aligned_cols(set(df.columns), to_version))
