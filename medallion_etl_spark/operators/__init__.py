"""Query/operator layer.

``ALL_QUERIES`` maps query name -> (spark_fn, oracle_sql | None); the
driver contract in __spark_entry__.py is assembled from it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_queries() -> dict[str, tuple[QueryFn, str | None]]:
    from . import (
        asof,
        cdc_query,
        coverage,
        curation,
        dedup_cluster,
        dedup_incremental,
        dedup_text,
        incremental,
        medallion,
        multimodal,
        packing,
        rangejoin,
        repetition,
        scd,
        sessionize,
        similarity,
        sketch,
        textops,
    )

    out: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        medallion,
        cdc_query,
        incremental,
        coverage,
        textops,
        repetition,
        dedup_text,
        dedup_cluster,
        dedup_incremental,
        curation,
        similarity,
        sketch,
        asof,
        rangejoin,
        sessionize,
        scd,
        packing,
        multimodal,
    ):
        out.update(mod.QUERIES)
    return out
