"""medallion_etl_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch Spark implementation of the query and data-processing
semantics of the reference single-node ETL (nahuel893/medallion-etl):
LSN-ordered change-event replay, last-writer-wins dedup, MERGE-style
upserts with schema evolution, exactly-once commits, plus the full
medallion (bronze->silver->gold) relational operator layer — all
expressed with the DataFrame API so Catalyst/Tungsten own the physical
plan.

Layout:
    session    — SparkSession factory (AQE, Arrow, UTC, shuffle sizing)
    schemas    — canonical StructTypes (docs, events, manifest, lineage)
    synth      — deterministic Spark-native CDC stream generator
    cdc/       — dedup, lake table, apply, manifest, lineage, replay
    operators/ — medallion query layer + training-data ops (dedup, ANN,
                 text analysis, multimodal plumbing)
    sources/   — typed readers (csv `;`, json-with-schema, parquet)
    functions/ — reusable column expressions (safe casts, sentinels)
    streaming/ — Structured Streaming replay (foreachBatch, checkpoint)
"""

__version__ = "0.1.0"
