"""CDC core: last-writer-wins dedup, lake table with atomic commits,
MERGE-style apply, exactly-once manifest, lineage, chunked replay."""
