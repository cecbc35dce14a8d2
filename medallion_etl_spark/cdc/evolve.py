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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import DOCS_SCHEMAS


def align_to_version(df: DataFrame, from_version: int, to_version: int) -> DataFrame:
    """Project ``df`` (shaped like DOCS_SCHEMAS[from_version]) onto
    DOCS_SCHEMAS[to_version]: add missing nullable columns as NULL and
    cast widened columns. Column order canonicalized."""
    if to_version < from_version:
        raise ValueError(f"cannot narrow schema v{from_version} -> v{to_version}")
    target = DOCS_SCHEMAS[to_version]
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name in have:
            col = F.col(field.name)
            if have[field.name] != field.dataType:
                col = col.cast(field.dataType)
            cols.append(col.alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def align_frame(df: DataFrame, to_version: int) -> DataFrame:
    """Align an arbitrary frame carrying some subset of doc columns to
    the target schema version (used for upsert payloads)."""
    target = DOCS_SCHEMAS[to_version]
    cols = []
    have = set(df.columns)
    for field in target.fields:
        if field.name in have:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
