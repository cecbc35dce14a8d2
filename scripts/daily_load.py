#!/usr/bin/env python
"""Daily-load driver: the reference's production cron entry point
(reference daily_load.py:42-152) re-expressed over the engine's phase
DAG (medallion_etl_spark/pipeline.py).

Differences from the reference, on purpose:
- dependents of a failed phase are SKIPPED and recorded
  (`skipped_upstream` + `blocked_by`), never run on stale upstream —
  the reference's documented flaw (it continues and later phases read
  half-refreshed silver);
- per-phase metrics (status, seconds, rows) print as one JSON report,
  the analog of its timing log (guia-daily-load.md:104-110);
- exit code 1 if any phase failed (same contract as the reference).

Phases over the testdata scale dir:
  bronze_events   CDC replay of the events stream into the LakeTable
  silver_docs     text quality/token stats over documents
  gold_htls       hectolitros measure (factor-lookup semantics)
  gold_cobertura  coverage outputs from one shared inner agg

Usage:
  python scripts/daily_load.py [--sf-dir /root/testdata/sf0.01]
                               [--out /tmp/daily_load_out] [--parallelism 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_etl_spark.pipeline import Phase, failed, run_pipeline
from medallion_etl_spark.session import get_spark

# Fixed bronze replay chunk size (see bronze_events: a data-derived
# size breaks the second run over a grown stream).
BRONZE_CHUNK_SIZE = 1_000_000


def build_phases(spark, sf_dir: str, out_dir: str) -> list[Phase]:
    from medallion_etl_spark.cdc.replay import replay
    from medallion_etl_spark.cdc.table import LakeTable
    from medallion_etl_spark.operators.cdc_query import _as_change_stream
    from medallion_etl_spark.operators.coverage import (
        coverage_outputs,
        hectolitros_measure,
    )
    from medallion_etl_spark.operators.textops import doc_quality_scores
    from medallion_etl_spark.sources.readers import load_table

    table_root = os.path.join(out_dir, "docs_table")

    def bronze_events():
        events = _as_change_stream(load_table(spark, sf_dir, "events"))
        if LakeTable.exists(table_root):
            table = LakeTable.load(table_root)
        else:
            table = LakeTable.create(table_root, n_buckets=8, schema_version=2)
        # FIXED chunk size, never derived from the stream's current max
        # LSN: chunk ids are a pure function of (bounds, chunk_size),
        # so a size that moves when the stream grows would re-plan
        # committed ids over different ranges and the manifest gate
        # would (correctly) refuse the day-2 run of this cron.
        res = replay(spark, events, table, chunk_size=BRONZE_CHUNK_SIZE)
        return {"rows_applied": res["rows_applied"]}

    def silver_docs():
        df = doc_quality_scores(spark, sf_dir)
        path = os.path.join(out_dir, "silver_doc_quality")
        df.write.mode("overwrite").parquet(path)
        return {"rows": spark.read.parquet(path).count()}

    def gold_htls():
        df = hectolitros_measure(spark, sf_dir)
        path = os.path.join(out_dir, "gold_htls")
        df.write.mode("overwrite").parquet(path)
        return {"rows": spark.read.parquet(path).count()}

    def gold_cobertura():
        outs = coverage_outputs(spark, sf_dir)
        counts = {}
        for name, df in outs.items():
            path = os.path.join(out_dir, name)
            df.write.mode("overwrite").parquet(path)
            counts[name] = spark.read.parquet(path).count()
        return counts

    return [
        Phase("bronze_events", bronze_events),
        Phase("silver_docs", silver_docs, deps=[]),
        Phase("gold_htls", gold_htls, deps=["silver_docs"]),
        Phase("gold_cobertura", gold_cobertura, deps=["silver_docs"]),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/daily_load_out")
    ap.add_argument("--parallelism", type=int, default=8)
    ap.add_argument("--fresh", action="store_true", help="wipe the output dir first")
    args = ap.parse_args()

    if args.fresh:
        shutil.rmtree(args.out, ignore_errors=True)
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("daily_load", parallelism=args.parallelism)
    report = run_pipeline(build_phases(spark, args.sf_dir, args.out))
    print(json.dumps(report, indent=1, default=str))
    sys.exit(1 if failed(report) else 0)


if __name__ == "__main__":
    main()
