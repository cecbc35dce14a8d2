"""MERGE-style upsert apply: one deduped change batch -> LakeTable.

Semantics (per batch, after LWW dedup to one event per key):
    latest op in ('I','U')  -> upsert the payload
    latest op == 'D'        -> write a tombstone for the key
identical to ``INSERT ... ON CONFLICT (key) DO UPDATE`` plus deletes
(reference stock_transformer.py:99-106 and the delete+insert range
replacement in sales_loader.py:64-73), expressed as union + max_by:
base rows carry the ``_lsn`` that produced them, so the survivor per
key is simply the row with the highest LSN across base ∪ batch. One
shuffle on the key — no separate anti join — and, crucially, correct
under ANY batch application order: an out-of-order micro-batch (or a
resume that replays chunks in a different order) converges to the same
state, because max-LSN-wins is order-independent and delete tombstones
block resurrection by stale lower-LSN updates.

Scale shape:
- The batch is LWW-deduped first (skew-aware, see dedup.py), then
  bucketed by the same hash the table uses. Only buckets containing
  changed keys are read back and rewritten (bucket-granular
  copy-on-write) — work per batch is O(|batch| + |touched buckets|),
  never O(|table|).
- The merge shuffles on doc_id; the batch side was already collapsed
  to one row per key by dedup, and the base side has one row per key
  by construction, so no key is hot in the merge — the skew lives in
  the dedup phase, where it is handled (dedup.py).
- Lineage (per-bucket LSN range / rows / bytes) is computed from the
  same cached deduped frame — one extra small aggregation, no second
  pass over the raw chunk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import DOCS_SCHEMAS
from .dedup import dedup_latest
from .lineage import write_lineage
from .table import LakeTable, bucket_expr


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for fn in filenames:
            total += os.path.getsize(os.path.join(dirpath, fn))
    return total


def apply_batch(
    spark: SparkSession,
    table: LakeTable,
    chunk: DataFrame,
    batch_id: int,
    lsn_lo: int,
    lsn_hi: int,
    *,
    dedup_strategy: str = "salted",
    n_salts: int = 16,
) -> dict:
    """Apply one LSN-chunk of change events. Idempotent: an already
    committed batch_id is a no-op; a crash before commit leaves the
    previous snapshot visible and the batch re-appliable."""
    if table.is_committed(batch_id):
        return {"batch_id": batch_id, "skipped": True}

    key = table.key_col
    latest = dedup_latest(chunk, keys=(key,), order_col="lsn", strategy=dedup_strategy, n_salts=n_salts)
    latest = latest.withColumn("_bucket", bucket_expr(key, table.n_buckets)).persist()

    # one small job: touched buckets + per-bucket lineage stats
    # (+ the stream's max schema_version, folded in to avoid a second
    # driver round-trip per chunk)
    has_sv = "schema_version" in chunk.columns
    sv_agg = (
        [F.max("schema_version").alias("max_sv")]
        if has_sv
        else [F.lit(None).cast("int").alias("max_sv")]
    )
    stats = (
        latest.groupBy("_bucket")
        .agg(
            F.count(F.lit(1)).alias("rows_applied"),
            F.min("lsn").alias("lsn_lo"),
            F.max("lsn").alias("lsn_hi"),
            *sv_agg,
        )
        .collect()
    )
    changed = sorted(int(r["_bucket"]) for r in stats)
    if not changed:
        table.commit({}, set(), (batch_id, {"lsn_lo": lsn_lo, "lsn_hi": lsn_hi, "rows_applied": 0}))
        latest.unpersist()
        return {"batch_id": batch_id, "rows_applied": 0, "buckets": []}

    # schema evolution: the stream tells us when to evolve
    target_sv = table.schema_version
    if has_sv:
        target_sv = max(target_sv, max(int(r["max_sv"]) for r in stats))

    def to_storage_layout(df: DataFrame, lsn_col: F.Column, deleted_col: F.Column) -> DataFrame:
        have = set(df.columns)
        cols = [
            (F.col(f.name).cast(f.dataType) if f.name in have else F.lit(None).cast(f.dataType)).alias(
                f.name
            )
            for f in DOCS_SCHEMAS[target_sv].fields
        ]
        return df.select(*cols, lsn_col.alias("_lsn"), deleted_col.alias("_deleted"))

    batch_rows = to_storage_layout(latest, F.col("lsn"), F.col("op") == "D")
    base = table.read(spark, buckets=changed, raw=True)
    base_aligned = to_storage_layout(base, F.col("_lsn"), F.col("_deleted"))
    combined = base_aligned.unionByName(batch_rows)
    merged = dedup_latest(combined, keys=(key,), order_col="_lsn", strategy="agg").withColumn(
        "_bucket", bucket_expr(key, table.n_buckets)
    )

    rel_dir = table.new_data_dir()
    out_dir = os.path.join(table.root, rel_dir)
    # Cluster rows so each bucket lands in exactly one task -> one
    # parquet file per bucket dir. Without this, partitionBy fans every
    # shuffle partition across every bucket (n_tasks × n_buckets tiny
    # files) and the next chunk's read-back drowns in file listings.
    merged.repartition(table.n_buckets, F.col("_bucket")).write.mode(
        "overwrite"
    ).partitionBy("_bucket").parquet(out_dir)

    # map written bucket dirs; a changed bucket with all rows deleted
    # produces no dir and is dropped from metadata
    new_dirs: dict[int, str] = {}
    for entry in os.listdir(out_dir):
        if entry.startswith("_bucket="):
            b = int(entry.split("=", 1)[1])
            new_dirs[b] = os.path.join(rel_dir, entry)
    removed = set(changed) - set(new_dirs)

    rows_applied = sum(int(r["rows_applied"]) for r in stats)
    lineage_rows = [
        {
            "batch_id": batch_id,
            "partition_id": int(r["_bucket"]),
            "lsn_lo": int(r["lsn_lo"]),
            "lsn_hi": int(r["lsn_hi"]),
            "rows_applied": int(r["rows_applied"]),
            "bytes_written": _dir_bytes(os.path.join(table.root, new_dirs[int(r["_bucket"])]))
            if int(r["_bucket"]) in new_dirs
            else 0,
        }
        for r in stats
    ]
    write_lineage(spark, table.root, batch_id, lineage_rows)

    table.commit(
        new_dirs,
        removed,
        (batch_id, {"lsn_lo": lsn_lo, "lsn_hi": lsn_hi, "rows_applied": rows_applied}),
        schema_version=target_sv if target_sv != table.schema_version else None,
    )
    latest.unpersist()
    return {"batch_id": batch_id, "rows_applied": rows_applied, "buckets": changed}
